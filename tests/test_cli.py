"""CLI end-to-end: ``python -m master_thesis_tpu`` short CHN train run on a
fake dataset tree, checkpointing, and full resume (params + opt_state +
step) through ``--resume_from_checkpoint``."""

import glob
import os
import subprocess
import sys

import pytest

from tests.fixtures import make_fake_data_root

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=900, cwd=_REPO):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run(
        [sys.executable, "-m", "master_thesis_tpu", *args],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=cwd,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    return out.stdout


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_fake_data_root(str(tmp_path_factory.mktemp("data")))


def test_cli_chn_train_and_resume(data_root, tmp_path):
    logs = str(tmp_path / "logs")
    common = [
        "--chn", "--chn_aligner", "cpn", "--chn_nb", "1",
        "--data_path", data_root, "--data_ckpt_path", str(tmp_path / "data.ckpt"),
        "--default_root_dir", logs,
        "--train_size", "64", "64", "--batch_size", "2", "--frames_n", "3",
        "--train_max_iterations", "2", "--validation_max_iterations", "1",
        "--num_workers", "1", "--compute_dtype", "float32",
    ]
    out = _run_cli(common + ["--max_epochs", "1"])
    assert "step 1" in out
    ckpts = sorted(glob.glob(os.path.join(logs, "version_0", "checkpoints", "*")))
    assert any(os.path.basename(p) == "2" for p in ckpts), ckpts

    # Resume: must restore step=2 and run exactly one more epoch (steps 3-4),
    # landing a step-4 checkpoint in a new version dir.
    out = _run_cli(common + [
        "--max_epochs", "2",
        "--resume_from_checkpoint", os.path.join(logs, "version_0"),
    ])
    # Resumed run starts AFTER the restored step: the "step N" print fires
    # at global_step 1 only on fresh runs, so its absence proves the step
    # counter carried over.
    assert "step 1 " not in out
    ckpts2 = glob.glob(os.path.join(logs, "version_1", "checkpoints", "*"))
    assert any(os.path.basename(p) == "4" for p in ckpts2), ckpts2
    # A full restart (no resume) would have saved a step-2 checkpoint here.
    assert not any(os.path.basename(p) == "2" for p in ckpts2)


def test_cli_dfpn_train_and_test(data_root, tmp_path):
    """The two DFPN run modes via the CLI (reference __main__.py:55-58):
    default-mode training saves a checkpoint; ``--test --test_checkpoint``
    computes the six DFPN losses over the DAVIS fixture and logs aligned
    frame grids to TensorBoard."""
    import glob as _glob
    import re

    logs = str(tmp_path / "logs")
    common = [
        "--data_path", data_root, "--data_ckpt_path", str(tmp_path / "data.ckpt"),
        "--default_root_dir", logs, "--compute_dtype", "float32",
        "--dfpn_base_size", "64",
    ]
    _run_cli(common + [
        "--train_size", "64", "64", "--batch_size", "2", "--frames_n", "2",
        "--train_max_iterations", "1", "--validation_max_iterations", "1",
        "--num_workers", "1", "--max_epochs", "1",
    ])
    ckpt = os.path.join(logs, "version_0")
    assert os.path.isdir(os.path.join(ckpt, "checkpoints"))

    out = _run_cli(common + [
        "--test", "--test_checkpoint", ckpt,
        "--test_size", "48", "64", "--batch_size", "1", "--frames_n", "2",
        "--num_workers", "1",
    ])
    loss = re.search(r"test/loss: ([-\d.]+)", out)
    assert loss, out
    assert float(loss.group(1)) == float(loss.group(1))  # finite, not nan
    assert _glob.glob(os.path.join(logs, "version_1", "events.out.tfevents.*"))


def test_cli_chn_with_dfpn_aligner(data_root, tmp_path):
    """Reference mode 3's second variant (__main__.py:33): CHN training
    with a DFPN aligner restored from a checkpoint — one DFPN train run
    produces the aligner, then a short CHN train consumes it."""
    logs = str(tmp_path / "logs")
    base = [
        "--data_path", data_root, "--data_ckpt_path", str(tmp_path / "data.ckpt"),
        "--default_root_dir", logs, "--compute_dtype", "float32",
        "--dfpn_base_size", "64", "--train_size", "64", "64",
        "--num_workers", "1", "--max_epochs", "1",
        "--train_max_iterations", "1", "--validation_max_iterations", "1",
    ]
    _run_cli(base + ["--batch_size", "2", "--frames_n", "2"])
    dfpn_ckpt = os.path.join(logs, "version_0")

    out = _run_cli(base + [
        "--chn", "--chn_aligner", "dfpn",
        "--chn_aligner_checkpoint", dfpn_ckpt,
        "--chn_nb", "1", "--batch_size", "2", "--frames_n", "3",
    ])
    assert "step 1" in out
    assert glob.glob(os.path.join(logs, "version_1", "checkpoints", "*"))


def test_cli_chn_test_mode(data_root, tmp_path):
    """The fourth run mode (reference __main__.py:43): full-video CHN test
    over the DAVIS fixture — trains one tiny checkpoint, then runs
    ``--chn --test --test_checkpoint``, asserting the three ``.avi``
    artifacts and finite PSNR/SSIM per algorithm."""
    import re

    logs = str(tmp_path / "logs")
    common = [
        "--chn", "--chn_aligner", "cpn", "--chn_nb", "1",
        "--data_path", data_root, "--data_ckpt_path", str(tmp_path / "data.ckpt"),
        "--default_root_dir", logs, "--compute_dtype", "float32",
    ]
    _run_cli(common + [
        "--train_size", "64", "64", "--batch_size", "2", "--frames_n", "3",
        "--train_max_iterations", "1", "--validation_max_iterations", "1",
        "--num_workers", "1", "--max_epochs", "1",
    ])
    ckpt = os.path.join(logs, "version_0")
    assert os.path.isdir(os.path.join(ckpt, "checkpoints"))

    out = _run_cli(common + [
        "--test", "--test_checkpoint", ckpt,
        "--test_size", "48", "64", "--num_workers", "1",
    ], cwd=str(tmp_path))
    for algo in ("ff", "ip", "cp"):
        avi = os.path.join(str(tmp_path), "generated_sequences", f"clip1_{algo}.avi")
        assert os.path.isfile(avi) and os.path.getsize(avi) > 0, avi
        psnr = re.search(rf"test/{algo}/psnr: ([-\d.]+)", out)
        ssim = re.search(rf"test/{algo}/ssim: ([-\d.]+)", out)
        assert psnr and ssim, out
        assert float(psnr.group(1)) > 0 and -1 <= float(ssim.group(1)) <= 1, out
    # Metrics land in TensorBoard (a tfevents file in a fresh version dir).
    assert glob.glob(os.path.join(logs, "version_1", "events.out.tfevents.*")), (
        os.listdir(logs)
    )
