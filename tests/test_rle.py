"""RLE codec round-trip + format checks."""
import numpy as np

from cartoonsegmentation_tpu.data import rle


def test_rle_roundtrip(rng):
    for shape in [(7, 5), (32, 32), (64, 48), (1, 1)]:
        for p in (0.1, 0.5, 0.9):
            m = rng.rand(*shape) < p
            enc = rle.encode(m)
            assert isinstance(enc['counts'], str)
            dec = rle.decode(enc)
            np.testing.assert_array_equal(dec, m)
            assert rle.area(enc) == int(m.sum())


def test_rle_empty_and_full():
    z = np.zeros((10, 8), bool)
    f = np.ones((10, 8), bool)
    assert rle.decode(rle.encode(z)).sum() == 0
    assert rle.decode(rle.encode(f)).sum() == 80
    assert rle.area(rle.encode(f)) == 80


def test_rle_known_value():
    """Simple case checked against pycocotools semantics: column-major
    runs with a leading zero-run."""
    m = np.zeros((3, 2), bool)
    m[0, 0] = True  # first pixel in F-order
    enc = rle.encode(m)
    from cartoonsegmentation_tpu.data.rle import _counts_from_mask
    assert _counts_from_mask(m) == [0, 1, 5]


def test_rle_iou():
    a = np.zeros((10, 10), bool); a[:5] = True
    b = np.zeros((10, 10), bool); b[3:8] = True
    got = rle.iou(rle.encode(a), rle.encode(b))
    assert abs(got - 20 / 80) < 1e-9
