"""Utility tests: metrics writer, post-processing, l2 reg."""

import json
import os

import numpy as np

from unet_zoo_tpu.utils import (
    MetricsWriter,
    convert_to_onehot,
    keep_largest_connected_components,
    l2_regularisation,
    map_image_to_intensity_range,
    normalise_image,
)


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), "train", tensorboard=False)
    w.scalars(10, {"loss": 1.5})
    w.scalars(20, {"loss": 1.0, "kl": 0.2})
    w.close()
    lines = [
        json.loads(l)
        for l in open(tmp_path / "metrics_train.jsonl").read().splitlines()
    ]
    assert lines[0]["step"] == 10 and lines[0]["loss"] == 1.5
    assert lines[1]["kl"] == 0.2


def test_metrics_writer_tensorboard(tmp_path):
    w = MetricsWriter(str(tmp_path), "val", tensorboard=True)
    w.scalars(1, {"dice": 0.8})
    w.image(1, "img", np.zeros((8, 8)))
    w.close()
    assert os.path.isdir(tmp_path / "tb_val")


def test_map_intensity_range():
    img = np.array([0.0, 5.0, 10.0])
    out = map_image_to_intensity_range(img, -1.0, 1.0)
    np.testing.assert_allclose(out, [-1.0, 0.0, 1.0])


def test_normalise_image():
    img = np.random.default_rng(0).uniform(5, 10, (16, 16))
    out = normalise_image(img)
    assert abs(out.mean()) < 1e-5 and abs(out.std() - 1) < 1e-4


def test_keep_largest_cc():
    mask = np.zeros((10, 10), dtype=np.uint8)
    mask[0:2, 0:2] = 1  # small component
    mask[5:9, 5:9] = 1  # large component
    mask[0, 9] = 2  # only component for label 2
    out = keep_largest_connected_components(mask)
    assert out[0, 0] == 0 and out[6, 6] == 1 and out[0, 9] == 2


def test_convert_to_onehot():
    lbl = np.array([[0, 2]])
    oh = convert_to_onehot(lbl, 3)
    assert oh.shape == (1, 2, 3)
    np.testing.assert_array_equal(oh[0, 1], [0, 0, 1])


def test_l2_regularisation_is_norm_not_squared():
    params = {"w": np.array([3.0, 4.0])}  # ||w|| = 5
    assert float(l2_regularisation(params)) == 5.0


def test_step_memory_analysis():
    import jax.numpy as jnp
    from unet_zoo_tpu.utils import step_memory_analysis

    m = step_memory_analysis(lambda x: jnp.sum(x * 2), jnp.ones((64, 64)))
    assert m["argument_bytes"] >= 64 * 64 * 4
    assert m["peak_bytes"] >= m["argument_bytes"]


def test_rescale_range_provider():
    import numpy as np
    from unet_zoo_tpu.data import BatchProvider

    X = np.random.default_rng(0).uniform(10, 20, (6, 8, 8)).astype(np.float32)
    y = np.zeros((6, 8, 8), np.uint8)
    bp = BatchProvider(X, y, np.arange(6), rescale_range=(-1.0, 1.0),
                       rng=np.random.default_rng(0))
    xb, _ = bp.next_batch(3)
    assert xb.min() >= -1.0 - 1e-5 and xb.max() <= 1.0 + 1e-5
    assert abs(xb.min() + 1.0) < 1e-4 and abs(xb.max() - 1.0) < 1e-4


def test_debug_helpers_match_reference_semantics():
    """convert_to_uint8 / norm_l2 / tile_batch_for_display (reference
    BratsProcessing/utils.py:164-167,101-110; utils.py:250-268)."""
    import numpy as np

    from unet_zoo_tpu.utils import (
        convert_to_uint8,
        norm_l2,
        tile_batch_for_display,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    u = convert_to_uint8(x)
    assert u.dtype == np.uint8 and u.min() == 0 and u.max() == 255

    a, v = rng.normal(size=50), rng.normal(size=50)
    # reference formula, computed independently
    an = (a - a.mean()) / (a.std() * len(a))
    vn = (v - v.mean()) / v.std()
    assert abs(norm_l2(a, v) - np.mean(np.sqrt(an**2 + vn**2))) < 1e-6

    b = rng.normal(size=(3, 4, 6, 1)).astype(np.float32)
    strip = tile_batch_for_display(b)
    assert strip.shape == (4, 18)
    np.testing.assert_array_equal(strip[:, 6:12], b[1, :, :, 0])
