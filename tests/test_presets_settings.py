"""Preset axis, settings validation, SSIM metric, logging subsystem."""

import numpy as np
import pytest

from svtav1_tpu.encoder.intra_encoder import EncoderConfig
from svtav1_tpu.encoder.presets import (MAX_ENC_MODE, apply_preset,
                                        verify_settings)
from svtav1_tpu.ops.metrics import ssim_plane
from svtav1_tpu.utils import log


def test_preset_axis_monotone_features():
    """Faster presets never enable a feature a slower one disables."""
    cfgs = [apply_preset(EncoderConfig(128, 64), m)
            for m in range(MAX_ENC_MODE + 1)]
    for a, b in zip(cfgs, cfgs[1:]):
        assert len(b.angle_deltas) <= len(a.angle_deltas)
        assert a.part_search or not b.part_search
        assert a.tx_search or not b.tx_search
        assert a.enable_cdef or not b.enable_cdef
        assert a.cdf_update or not b.cdf_update


def test_preset_out_of_range():
    with pytest.raises(ValueError):
        apply_preset(EncoderConfig(128, 64), MAX_ENC_MODE + 1)


@pytest.mark.parametrize("field,val,msg", [
    ("qindex", 256, "qindex"),
    ("bit_depth", 12, "bit_depth"),
    ("tile_cols", 3, "tile_cols"),
    ("width", 100, "multiple of 64"),
    ("width", 4160, "4096"),
])
def test_verify_settings_rejects(field, val, msg):
    from dataclasses import replace
    cfg = replace(EncoderConfig(128, 64), **{field: val})
    with pytest.raises(ValueError, match=msg):
        verify_settings(cfg)


def test_verify_settings_accepts_valid():
    verify_settings(EncoderConfig(1920, 1088, qindex=100))


def test_ssim_identity_and_ordering():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    assert ssim_plane(a, a) == pytest.approx(1.0)
    small = np.clip(a.astype(int) + rng.randint(-2, 3, a.shape), 0, 255)
    big = np.clip(a.astype(int) + rng.randint(-40, 41, a.shape), 0, 255)
    s_small = ssim_plane(a, small)
    s_big = ssim_plane(a, big)
    assert 0.0 < s_big < s_small < 1.0


def test_ssim_flat_blocks_stable():
    a = np.full((32, 32), 128, np.uint8)
    b = np.full((32, 32), 129, np.uint8)
    s = ssim_plane(a, b)
    assert 0.9 < s <= 1.0


def test_log_levels(capsys):
    old = log.get_level()
    try:
        log.set_level(log.WARN)
        log.info("t", "hidden %d", 1)
        log.warn("t", "shown %d", 2)
        err = capsys.readouterr().err
        assert "hidden" not in err and "shown 2" in err
    finally:
        log.set_level(old)
