"""System-level E2E: the CLI's CHN test mode against the reference's own
test path — real CPN align inside the loops, shared converted weights,
non-square 240x480, batch 1 (the reference's forced CHN-test geometry).

The reference's CHN test path is ``test_step -> inpaint_{ff,ip,cp}``
(model_chn.py:309-322), with the aligner invoked INSIDE every refine step
(model_chn.py:115, :167, :227). Earlier parity tests isolate the algorithm
layer with an identity-aligner stub (tests/test_reference_algorithms.py);
this module pins the CLI-visible output end-to-end instead:

- ours: :func:`master_thesis_tpu.__main__.run_chn_test` — the actual CLI
  mode-4 function (meta scan -> test loader -> CPN.align -> CHN -> ff/ip/cp
  device programs -> metrics -> video writing), with ``write_video``
  monkeypatched to capture the arrays the CLI writes;
- reference: ``CHN.inpaint_*`` with the reference CPN as ``model_aligner``,
  consuming the identical input sequence (our test loader's decoded/
  resized/dilated arrays — loader parity itself is pinned separately in
  tests/test_data.py).

The CPN is random-init with the regressor head pinned to an exact
whole-pixel translation (``fc.weight = 0``, bias = [1,0,2kx/W,0,1,2ky/H]):
the full encoder/regressor/warp graph runs on both sides and the warp
genuinely displaces the references, but sample positions stay on pixel
centers, so warped values are exact and the ``v > 0.5`` visibility
threshold (model_cpn.py:87-88) cannot flip on float noise. Value-level
affine-warp parity at arbitrary regressed thetas is pinned separately in
tests/test_models_cpn.py. ``nb`` is reduced to 1 (the loop/align semantics
are nb-independent; both sides share the same converted trunk weights).
"""

import os

import numpy as np
import pytest
import torch

from tests.fixtures import make_fake_data_root
from tests.ref_import import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

H, W = 240, 480  # the reference CLI's default test_size (non-square)
SHIFT_X, SHIFT_Y = 6, 4  # whole-pixel CPN translation (see module docstring)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """(cfg kwargs, reference CHN with CPN aligner) over a DAVIS fixture
    whose mask strip moves fast enough that every hole is fully revealed
    within candidate distance ~2 — the loops exit on the ``hole < e`` rule
    after a few refines (bounded CPU runtime)."""
    import cv2

    from master_thesis_tpu.config import Config

    root = tmp_path_factory.mktemp("e2e")
    data_root = make_fake_data_root(str(root / "data"))
    davis = os.path.join(data_root, "DAVIS-2017")
    davis_j = os.path.join(davis, "JPEGImages", "480p", "clip1")
    davis_a = os.path.join(davis, "Annotations_Dense", "480p", "clip1")
    for d in (davis_j, davis_a):
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
    rng = np.random.RandomState(5)
    h, w = 120, 240  # stored at half target: resize doubles the strip motion
    base = cv2.GaussianBlur(
        rng.randint(0, 255, (h, w, 3), np.uint8), (0, 0), 2
    )
    frames = 6
    for i in range(frames):
        cv2.imwrite(
            os.path.join(davis_j, f"{i:05d}.jpg"), base,
            [cv2.IMWRITE_JPEG_QUALITY, 95],
        )
        m = np.zeros((h, w), np.uint8)
        x0 = 40 + 12 * i
        m[30:90, x0 : x0 + 24] = 255
        cv2.imwrite(os.path.join(davis_a, f"{i:05d}.png"), m)

    ref = load_reference()
    torch.manual_seed(11)
    cpn_t = ref.CPN().eval()
    with torch.no_grad():
        cpn_t.A_Regressor.fc.weight.zero_()
        cpn_t.A_Regressor.fc.bias.copy_(
            torch.tensor([1.0, 0.0, 2.0 * SHIFT_X / W, 0.0, 1.0, 2.0 * SHIFT_Y / H])
        )
    for p in cpn_t.parameters():
        p.requires_grad = False
    chn_t = ref.CHN(None, None, cpn_t)
    chn_t.nn = ref.model_chn.RRDBNet(in_nc=9, out_nc=3, nb=1)
    chn_t = chn_t.eval()

    cpn_pth = str(root / "cpn.pth")
    chn_pth = str(root / "chn.pth")
    torch.save(cpn_t.state_dict(), cpn_pth)
    torch.save(chn_t.state_dict(), chn_pth)

    cfg = Config(
        chn=True, test=True, chn_aligner="cpn", chn_nb=1,
        chn_aligner_checkpoint=cpn_pth, test_checkpoint=chn_pth,
        data_path=data_root, data_ckpt_path=str(root / "data.ckpt"),
        default_root_dir=str(root / "logs"),
        test_size=(H, W), num_workers=1, compute_dtype="float32",
    )
    return cfg, chn_t


def test_cli_chn_test_path_matches_reference(env, monkeypatch, tmp_path):
    cfg, chn_t = env

    captured = {}

    def fake_write_video(x, file_name, out_dir="generated_sequences"):
        captured[file_name] = np.array(x, copy=True)
        return os.path.join(str(tmp_path), f"{file_name}.avi")

    import master_thesis_tpu.__main__ as cli
    import master_thesis_tpu.infer.video as video_mod

    monkeypatch.setattr(video_mod, "write_video", fake_write_video)
    monkeypatch.chdir(tmp_path)  # TB logs / artifacts land in tmp
    cli.run_chn_test(cfg)

    # The same sequence the CLI consumed, via the same loader construction.
    from master_thesis_tpu.data import meta as meta_mod
    from master_thesis_tpu.train import build as build_mod

    metas = meta_mod.prepare_data(cfg)
    loaders = build_mod.build_loaders(cfg, metas, splits=("test",))
    batch = next(iter(loaders["test"]))
    x, m = batch["x"][0], batch["m"][0]
    assert x.shape == (6, H, W, 3)
    assert set(captured) == {f"clip1_{a}" for a in ("ff", "ip", "cp")}

    # Reference stack on the identical input: (F,H,W,C) -> (C,F,H,W).
    x_t = torch.from_numpy(np.ascontiguousarray(x.transpose(3, 0, 1, 2)))
    m_t = torch.from_numpy(np.ascontiguousarray(m.transpose(3, 0, 1, 2)))
    for algo in ("ff", "ip", "cp"):
        with torch.no_grad():
            # inpaint_ip/cp mutate their inputs in place — clone per call.
            ref_out = (
                getattr(chn_t, f"inpaint_{algo}")(x_t.clone(), m_t.clone())
                .numpy().transpose(1, 2, 3, 0)
            )
        got = captured[f"clip1_{algo}"]
        np.testing.assert_allclose(got, ref_out, atol=1e-4, err_msg=algo)
