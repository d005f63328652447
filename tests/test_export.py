"""StableHLO export (tools/export_model.py): serialize → deserialize → run.

The deserialized artifact must reproduce the live forward with NO access to
the model code — that is the deployment contract. Agreement is to
compilation-rounding tolerance (~1e-7: the exported lowering and the live
jit may fuse differently), not bitwise.
"""

import numpy as np
import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu import train
from tests.test_train import tiny_train_cfg


def test_export_roundtrip_matches_live_forward(tiny_asset):
    from indirect_learning_pose_shape_tpu.export import export_forward, load_exported
    from indirect_learning_pose_shape_tpu.models import network as net

    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    blob = export_forward(cfg, ts.params, ts.model_state, consts, batch=2,
                          platforms=["cpu"])
    assert len(blob) > 10_000  # weights are baked in

    fn = load_exported(blob)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(2, cfg.model.image_size, cfg.model.image_size, 3).astype(np.float32)
        * 2.0
        - 1.0
    )
    theta, verts, kp2d = fn(images)

    want, _ = net.forward(
        ts.params, ts.model_state, consts, images, cfg.model, train=False
    )
    np.testing.assert_allclose(
        np.asarray(theta), np.asarray(want["theta"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(verts), np.asarray(want["verts"]), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(kp2d), np.asarray(want["kp2d"]), atol=1e-3)
