"""Algorithm-level E2E parity of the three full-video inpainting
algorithms against the ACTUAL reference loops (model_chn.py:87-254).

Both stacks run the real nb=20 CHN with shared converted weights and an
identity-align stub (the reference CHN only calls ``model_aligner.align``
in the loops, model_chn.py:115, :167, :227, so a stub aligner isolates the
algorithm semantics: candidate order, the forced first pass
(``y_hat_comp is None``), strict ``inp_per > e`` termination, cp's
finalize-or-continue rule at :250-252). Asserted for the on-device
single-program implementations AND the host-loop twins.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from master_thesis_tpu.infer.algorithms import Inpainter
from master_thesis_tpu.models import convert
from master_thesis_tpu.models.chn import CHN
from tests.ref_import import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)


class _IdentityAlignerTorch:
    """Aligner stub with the reference align contract (model_cpn.py:31-91 /
    model_dfpn.py:103-133): refs pass through unwarped, visibility is the
    inverse mask, v_map = visible-in-ref minus visible-in-target."""

    def align(self, x_target, m_target, x_refs, m_refs):
        v_ref_aligned = 1 - m_refs
        v_map = torch.clamp(v_ref_aligned - (1 - m_target).unsqueeze(2), 0, 1)
        return x_refs, v_ref_aligned, v_map


def _identity_align_jax(x_t, m_t, x_r, m_r):
    v_aligned = 1 - m_r
    v_map = jnp.clip(v_aligned - (1 - m_t[:, None]), 0, 1)
    return x_r, v_aligned, v_map


@pytest.fixture(scope="module")
def pair():
    """(reference CHN with identity aligner, device-loop Inpainter,
    host-loop Inpainter) sharing converted nb=20 weights."""
    ref = load_reference()
    torch.manual_seed(3)
    chn_t = ref.CHN(None, None, _IdentityAlignerTorch()).eval()
    sd = {k: v.detach() for k, v in chn_t.state_dict().items()}

    chn = CHN(nb=20)
    params = {"params": convert.chn_from_torch(sd, nb=20)}
    dev = Inpainter(chn.apply, params, _identity_align_jax)
    host = Inpainter(chn.apply, params, _identity_align_jax, device_loops=False)
    return chn_t, dev, host


def _sequence(rng, F=6, h=64, w=64, static_hole=False):
    """Moving binary hole: with the identity aligner, neighbors reveal the
    target's hole gradually, so ff/ip consume several candidates per frame
    and cp needs more than one pass — the loop logic actually exercises.

    ``static_hole`` adds a hole region present in EVERY frame: no neighbor
    ever reveals it, so every frame's candidate list exhausts with
    ``inp_per > e`` — the ff/ip exhaustion exits and cp's force-finish
    (reference model_chn.py:250-252) fire deliberately, not incidentally."""
    y = rng.rand(F, h, w, 3).astype(np.float32)
    m = np.zeros((F, h, w, 1), np.float32)
    for t in range(F):
        m[t, 10 + 4 * t : 26 + 4 * t, 16:40] = 1
    if static_hole:
        m[:, 4:14, w - 14 : w - 4] = 1
    x = (1 - m) * y + m * np.asarray([0.485, 0.456, 0.406], np.float32)
    return x, m


# Geometries: the production-shaped default, and a second parameterization
# (VERDICT r3 item 7) pinning the edge cases — frame stride s=2 with a
# tight D=3 (two-candidate lists), a non-square sequence, candidate
# exhaustion above ``e`` on every frame, and cp's force-finish passes
# (N=4 makes passes 2-3 the ``i >= N - 2`` force-finish passes while real
# holes remain).
GEOMS = {
    "s1_D20_64sq": dict(
        h=64, w=64, static_hole=False,
        ff_ip=dict(s=1, D=20), cp=dict(N=20, s=1),
    ),
    "s2_D3_48x64_exhaust": dict(
        h=48, w=64, static_hole=True,
        ff_ip=dict(s=2, D=3), cp=dict(N=4, s=2),
    ),
}


def _to_torch(x, m):
    # (F,H,W,C) numpy -> reference layout (C,F,H,W) / (1,F,H,W)
    return (
        torch.from_numpy(np.ascontiguousarray(x.transpose(3, 0, 1, 2))),
        torch.from_numpy(np.ascontiguousarray(m.transpose(3, 0, 1, 2))),
    )


def _from_torch(t):
    return t.numpy().transpose(1, 2, 3, 0)  # (C,F,H,W) -> (F,H,W,C)


@pytest.mark.parametrize("geom", list(GEOMS))
@pytest.mark.parametrize("algo", ["ff", "ip", "cp"])
def test_inpaint_matches_reference(rng, algo, geom, pair):
    chn_t, dev, host = pair
    g = GEOMS[geom]
    x, m = _sequence(rng, h=g["h"], w=g["w"], static_hole=g["static_hole"])
    kwargs = g["cp"] if algo == "cp" else g["ff_ip"]
    if g["static_hole"]:
        # The second geometry's premise: the static hole keeps every frame
        # above e=1% after its candidates exhaust, so the exhaustion exits /
        # force-finish rules are what terminates the loops.
        assert m[0, 4:14].sum() * 100 / (g["h"] * g["w"]) > 1.0
    x_t, m_t = _to_torch(x, m)
    with torch.no_grad():
        # inpaint_ip/cp mutate their input tensors in place
        # (model_chn.py:155, :211 alias x/m via unsqueeze) — clone per call.
        ref_out = _from_torch(
            getattr(chn_t, f"inpaint_{algo}")(x_t.clone(), m_t.clone(), **kwargs)
        )
    for impl in (dev, host):
        out = getattr(impl, f"inpaint_{algo}")(x, m, **kwargs)
        np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_inpaint_ff_compaction_truncation_matches_reference(rng, pair):
    """ff with a compact width narrower than the eligible set (C=2 over 6
    frames: the gather truncates from the first iteration, VERDICT r4 weak
    #4 — production F=12+ sequences run this branch) against the
    reference's own per-frame loop."""
    chn_t, dev, host = pair
    g = GEOMS["s1_D20_64sq"]
    x, m = _sequence(rng, h=g["h"], w=g["w"], static_hole=False)
    x_t, m_t = _to_torch(x, m)
    with torch.no_grad():
        ref_out = _from_torch(chn_t.inpaint_ff(x_t.clone(), m_t.clone(), s=1, D=20))
    for impl in (dev, host):
        out = impl.inpaint_ff(x, m, s=1, D=20, compact=2)
        np.testing.assert_allclose(out, ref_out, atol=1e-4)
