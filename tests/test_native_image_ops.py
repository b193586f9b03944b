"""Native C++ image ops: bit-parity with the PIL pipeline."""

import numpy as np
import pytest

from v2pe_tpu import native
from v2pe_tpu.data.constants import IMAGENET_MEAN, IMAGENET_STD
from v2pe_tpu.data.tiling import dynamic_preprocess, plan_tiles
from v2pe_tpu.data.transforms import build_transform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("sh,sw,dh,dw", [
    (100, 160, 448, 448),   # upscale
    (1080, 1920, 448, 896),  # downscale
    (448, 448, 448, 448),   # identity-size
    (37, 53, 448, 448),     # odd sizes
])
def test_resize_bit_matches_pil(sh, sw, dh, dw):
    from PIL import Image

    rng = np.random.RandomState(sh + sw)
    arr = rng.randint(0, 255, (sh, sw, 3), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(arr).resize((dw, dh), Image.BICUBIC))
    got = native.pil_resize_rgb(arr, dh, dw)
    np.testing.assert_array_equal(got, ref)


def test_tile_pipeline_matches_pil_pipeline():
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (600, 1000, 3), dtype=np.uint8)
    img = Image.fromarray(arr)

    gw, gh, n, _ = plan_tiles(1000, 600, max_num=12, image_size=448,
                              use_thumbnail=True)
    # reference PIL path
    tiles = dynamic_preprocess(img, max_num=12, image_size=448,
                               use_thumbnail=True)
    t = build_transform(is_train=False, input_size=448)
    ref = np.stack([t(x) for x in tiles])

    got = native.tile_resize_normalize(arr, gw, gh, 448, True,
                                       IMAGENET_MEAN, IMAGENET_STD)
    assert got.shape == ref.shape == (n, 3, 448, 448)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_faster_than_pil():
    import time

    from PIL import Image

    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (800, 1200, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    gw, gh, _, _ = plan_tiles(1200, 800, max_num=12, image_size=448,
                              use_thumbnail=True)
    t = build_transform(is_train=False, input_size=448)

    native.tile_resize_normalize(arr, gw, gh, 448, True, IMAGENET_MEAN,
                                 IMAGENET_STD)  # warm

    t0 = time.perf_counter()
    for _ in range(3):
        tiles = dynamic_preprocess(img, max_num=12, image_size=448,
                                   use_thumbnail=True)
        np.stack([t(x) for x in tiles])
    pil_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        native.tile_resize_normalize(arr, gw, gh, 448, True, IMAGENET_MEAN,
                                     IMAGENET_STD)
    nat_t = time.perf_counter() - t0
    # don't assert hard numbers on a loaded CI core; just report regressions
    print(f"PIL {pil_t:.3f}s vs native {nat_t:.3f}s")
    assert nat_t < pil_t * 2.0
