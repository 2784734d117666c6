"""CLI flag parsing: boolean flags accept explicit values (the reference's
``type=bool`` declarations silently parse ``--image_resize False`` as True,
reference data.py:336 — fixed here with str2bool)."""

import argparse

import pytest

from master_thesis_tpu.config import Config


def _parse(argv):
    parser = argparse.ArgumentParser()
    Config.add_argparse_args(parser)
    return Config.from_args(parser.parse_args(argv))


def test_boolean_flags_accept_values():
    cfg = _parse(["--image_resize", "false", "--frames_randomize", "0"])
    assert cfg.image_resize is False
    assert cfg.frames_randomize is False
    cfg = _parse(["--image_resize", "true", "--use_pallas", "False"])
    assert cfg.image_resize is True
    assert cfg.use_pallas is False


def test_boolean_flags_bare_and_default():
    cfg = _parse([])
    assert cfg.image_resize is True and cfg.use_pallas is True
    assert cfg.chn_remat is False and cfg.donate_buffers is True
    cfg = _parse(["--chn_remat"])
    assert cfg.chn_remat is True


def test_boolean_flag_rejects_garbage(capsys):
    with pytest.raises(SystemExit):
        _parse(["--image_resize", "maybe"])


def test_trainer_flags_parse():
    cfg = _parse([
        "--accumulate_grad_batches", "4", "--gradient_clip_val", "0.5",
        "--val_check_interval", "100", "--limit_val_batches", "0.25",
    ])
    assert cfg.accumulate_grad_batches == 4
    assert cfg.gradient_clip_val == 0.5
    assert cfg.val_check_interval == 100
    assert cfg.limit_val_batches == 0.25


def test_chn_test_mode_mutation():
    cfg = _parse(["--chn", "--test"])
    assert cfg.batch_size == 1 and cfg.frames_n == -1
