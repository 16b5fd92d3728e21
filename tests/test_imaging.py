"""Unit + property tests for the bilinear resampler (functions/imaging.py)
— the kernel behind the REAL multimodal_resize face. The three provable
properties the Spark face certifies per row are pinned here directly, plus
the exact cases a closed-form answer exists for."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trike_spark.functions.imaging import (
    bilinear_resize,
    certify_resize,
    fit_longest_edge,
)


def test_identity_is_exact() -> None:
    rng = np.random.default_rng(1)
    for shape in [(5, 7), (5, 7, 3), (1, 4), (4, 1, 3), (2, 2)]:
        src = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
        assert np.array_equal(bilinear_resize(src, shape[0], shape[1]), src)


def test_constant_image_stays_constant() -> None:
    src = np.full((6, 9, 3), 173, dtype=np.uint8)
    out = bilinear_resize(src, 224, 149)
    assert out.shape == (224, 149, 3)
    assert (out == 173).all()


def test_linear_ramp_midpoint_exact() -> None:
    # 1x2 [0, 100] upsampled to 1x3: align-corners samples x = 0, 0.5, 1
    # -> exactly [0, 50, 100].
    src = np.array([[0, 100]], dtype=np.uint8)
    out = bilinear_resize(src, 1, 3)
    assert out.tolist() == [[0, 50, 100]]


def test_2x_upsample_known_values() -> None:
    # 2x2 -> 3x3 with align-corners: center = mean of the four corners,
    # edge midpoints = pairwise means.
    src = np.array([[0, 40], [80, 120]], dtype=np.uint8)
    out = bilinear_resize(src, 3, 3)
    assert out.tolist() == [[0, 20, 40], [40, 60, 80], [80, 100, 120]]


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    oh=st.integers(1, 40),
    ow=st.integers(1, 40),
    chan=st.sampled_from([None, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_certification_properties_hold(h, w, oh, ow, chan, seed) -> None:
    rng = np.random.default_rng(seed)
    shape = (h, w) if chan is None else (h, w, chan)
    src = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
    out = bilinear_resize(src, oh, ow)
    assert out.shape[:2] == (oh, ow)
    assert int(out.min()) >= int(src.min()) and int(out.max()) <= int(src.max())
    assert np.array_equal(out[0, 0], src[0, 0])
    if oh > 1 and ow > 1:
        assert np.array_equal(out[-1, -1], src[-1, -1])
    assert certify_resize(src, out)


def test_fit_longest_edge() -> None:
    assert fit_longest_edge(10, 5, 224) == (224, 112)
    assert fit_longest_edge(5, 10, 224) == (112, 224)
    assert fit_longest_edge(7, 7, 224) == (224, 224)
    # floor math, never zero
    assert fit_longest_edge(1, 1000, 224) == (1, 224)


def test_rejects_bad_inputs() -> None:
    with pytest.raises(ValueError):
        bilinear_resize(np.zeros((3, 3), dtype=np.float64), 2, 2)
    with pytest.raises(ValueError):
        bilinear_resize(np.zeros((3, 3), dtype=np.uint8), 0, 2)
