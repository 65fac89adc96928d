"""Zero-copy binary column access (functions/binview.py)."""

import numpy as np
import pyarrow as pa

from kafka_delta_rs_ray.functions.binview import binary_views


def test_binary_views_matches_to_pylist():
    rng = np.random.default_rng(0)
    vals = [rng.bytes(int(rng.integers(0, 60))) for _ in range(80)]
    vals[5] = None
    vals[41] = None
    for typ in (pa.binary(), pa.large_binary()):
        arr = pa.array(vals, typ)
        for col in (arr, arr.slice(11, 50),
                    pa.chunked_array([arr.slice(0, 25), arr.slice(25)])):
            exp = (col.to_pylist() if not isinstance(col, pa.Array)
                   else col.to_pylist())
            got = binary_views(col)
            assert len(got) == len(exp)
            for g, v in zip(got, exp):
                assert (g is None) == (v is None)
                if g is not None:
                    assert bytes(g) == v


def test_binary_views_feed_codecs():
    from kafka_delta_rs_ray.codecs import decode, encode

    img = np.random.default_rng(1).integers(
        0, 255, (8, 8, 3), dtype=np.uint8)
    col = pa.array([encode(img, "rawz"), encode(img, "dctq")],
                   pa.large_binary())
    views = binary_views(col)
    assert isinstance(views[0], memoryview)  # genuinely zero-copy
    assert np.array_equal(decode(views[0], "rawz"), img)
    assert decode(views[1], "dctq").shape == img.shape
