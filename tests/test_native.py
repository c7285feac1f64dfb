"""Native C++ I/O codec: correctness vs the Python stdlib paths."""

import base64

import numpy as np

from topopt_in_petsc_tpu.io import native


def test_b64_matches_stdlib():
    rng = np.random.default_rng(0)
    for n in (0, 1, 2, 3, 4, 100, 4096, 100001):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert native.b64_encode(data) == base64.b64encode(data)


def test_f64_to_f32():
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(17, 9, 3))
    np.testing.assert_array_equal(
        native.f64_to_f32(arr), arr.astype(np.float32)
    )


def test_checksum_deterministic():
    data = b"hello topopt" * 1000
    assert native.checksum64(data) == native.checksum64(data)
    assert native.checksum64(data) != native.checksum64(data[:-1])


def test_native_lib_builds():
    """On this image (g++ present) the real native path must be active."""
    lib = native._build_and_load()
    assert lib is not None, "native codec failed to build"
