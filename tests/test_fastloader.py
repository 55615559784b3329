"""Native fastloader tests: PNG decode correctness vs PIL + async pool."""

import numpy as np
import pytest
from PIL import Image

from fourdgs_tpu.data.fastloader import PrefetchPool, decode_png, get_lib


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i, mode in enumerate(["RGB", "RGBA", "RGB"]):
        arr = rng.integers(0, 255, (40, 60, len(mode)), dtype=np.uint8)
        p = str(d / f"img{i}_{mode}.png")
        Image.fromarray(arr, mode).save(p)
        paths.append((p, arr[..., :3]))
    return paths


def test_native_lib_builds():
    assert get_lib() is not None, "fastloader.so failed to build"


def test_decode_matches_pil(pngs):
    for path, expect in pngs:
        out = decode_png(path, 60, 40)
        assert out is not None, f"native decode rejected {path}"
        np.testing.assert_array_equal(out, expect)


def test_decode_rejects_wrong_size(pngs):
    path, _ = pngs[0]
    assert decode_png(path, 61, 40) is None


def test_prefetch_pool(pngs):
    class Ref:
        def __init__(self, path, expect):
            self.path = path
            self.size = (60, 40)
            self._expect = expect

        def __call__(self):
            return np.asarray(Image.open(self.path).convert("RGB"))

    refs = [Ref(p, e) for p, e in pngs] * 4
    pool = PrefetchPool(n_threads=4)
    pool.submit_batch(refs)
    batch = pool.wait_batch()
    assert batch.shape == (12, 40, 60, 3)
    for i, ref in enumerate(refs):
        np.testing.assert_array_equal(batch[i], ref._expect)
    pool.close()
