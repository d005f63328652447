"""Inference entry point + asset conversion tool tests (SURVEY.md §2.9, §2.11)."""

import os
import pickle
import subprocess
import sys

import numpy as np

from indirect_learning_pose_shape_tpu.utils import assets as assets_lib


def test_predict_demo_end_to_end(tmp_path, monkeypatch):
    """predict --demo writes overlays and meshes (the manual vis harness)."""
    out = str(tmp_path / "vis")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SMPL_TINY_TEST"] = "1"
    # Run in-process with a tiny model config for CPU speed.
    import dataclasses

    from indirect_learning_pose_shape_tpu import configs, predict
    from tests.test_network import small_model_cfg

    cfg = dataclasses.replace(configs.CONFIG4_FULL, model=small_model_cfg(48))
    asset = assets_lib.synthetic_asset(num_verts=864, seed=1)
    params, state, consts = predict.load_model(cfg, None, asset)

    import jax

    from indirect_learning_pose_shape_tpu.data import synthetic

    batch = jax.jit(lambda k: synthetic.generate_batch(k, 2, consts, cfg.model))(
        jax.random.PRNGKey(0)
    )
    outputs = predict.predict(params, state, consts, batch["image"], cfg)
    assert outputs["verts"].shape == (2, 864, 3)
    rendered = predict.render_silhouette(outputs, consts, cfg)

    os.makedirs(out, exist_ok=True)
    predict.save_obj(
        os.path.join(out, "m.obj"), np.asarray(outputs["verts"][0]), asset.faces
    )
    predict.save_overlay(
        os.path.join(out, "o.png"),
        np.asarray(batch["image"][0]),
        np.asarray(rendered["silhouette"][0]),
        np.asarray(outputs["kp2d"][0]),
    )
    assert os.path.getsize(os.path.join(out, "m.obj")) > 1000
    assert os.path.getsize(os.path.join(out, "o.png")) > 1000

    # --int8 wiring: predict(qparams=...) routes through the quantized
    # serving encoder and yields the same output contract.
    from indirect_learning_pose_shape_tpu.models import quantize as quant

    qparams = quant.ptq_quantize(
        params["encoder"], state["encoder"], cfg.model.encoder, batch["image"]
    )
    out_q = predict.predict(
        params, state, consts, batch["image"], cfg, qparams=qparams
    )
    assert out_q["verts"].shape == (2, 864, 3)
    assert np.isfinite(np.asarray(out_q["kp2d"])).all()


def test_load_image_files(tmp_path):
    """predict --image path: arbitrary files, with and without masks."""
    from PIL import Image

    from indirect_learning_pose_shape_tpu import predict

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (80, 60, 3), np.uint8)
    mask = np.zeros((80, 60), np.uint8)
    mask[20:60, 15:45] = 3  # person blob occupying a sub-box
    ip = str(tmp_path / "person.png")
    mp = str(tmp_path / "mask.png")
    Image.fromarray(img).save(ip)
    Image.fromarray(mask).save(mp)

    out = predict.load_image_files([ip], [mp], size=32)
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0

    # No mask: full-frame centre square; grayscale jpgs broadcast to RGB.
    out2 = predict.load_image_files([ip], None, size=32)
    assert out2.shape == (1, 32, 32, 3)
    # Mask crop zooms into the blob -> different pixels than full frame.
    assert np.abs(out - out2).max() > 0.05

    import pytest

    with pytest.raises(ValueError, match="count"):
        predict.load_image_files([ip], [mp, mp], size=32)


def _fake_chumpy_pkl(path, asset):
    """Write a pkl mimicking the chumpy-era SMPL format (chumpy Ch objects).

    Registers a fake `chumpy.ch` module so pickle can serialize the class by
    reference exactly as the real asset does; loading must NOT need it (the
    unpickler shim replaces it).
    """
    import types

    class Ch:  # stand-in for chumpy.Ch: state dict carries 'x'
        pass

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    chumpy_mod = types.ModuleType("chumpy")
    ch_mod = types.ModuleType("chumpy.ch")
    ch_mod.Ch = Ch
    chumpy_mod.ch = ch_mod
    sys.modules.setdefault("chumpy", chumpy_mod)
    sys.modules["chumpy.ch"] = ch_mod

    def ch(arr):
        o = Ch()
        o.x = np.asarray(arr, np.float64)
        return o
    data = {
        "v_template": ch(asset.v_template),
        "shapedirs": ch(asset.shapedirs),
        "posedirs": np.asarray(asset.posedirs, np.float64),
        "J_regressor": np.asarray(asset.J_regressor, np.float64),
        "cocoplus_regressor": np.asarray(asset.cocoplus_regressor, np.float64),
        "weights": ch(asset.weights),
        "kintree_table": np.stack(
            [asset.parents.astype(np.int64), np.arange(asset.num_joints)]
        ),
        "f": asset.faces,
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


def test_pkl_roundtrip_with_chumpy_shim(tmp_path):
    asset = assets_lib.synthetic_asset(num_verts=864, seed=3)
    pkl = str(tmp_path / "model.pkl")
    _fake_chumpy_pkl(pkl, asset)
    loaded = assets_lib.load_pkl(pkl)
    loaded.validate()
    np.testing.assert_allclose(loaded.v_template, asset.v_template, atol=1e-6)
    np.testing.assert_allclose(loaded.weights, asset.weights, atol=1e-6)
    np.testing.assert_array_equal(loaded.parents, asset.parents)


def test_convert_tool_cli(tmp_path):
    asset = assets_lib.synthetic_asset(num_verts=864, seed=4)
    pkl = str(tmp_path / "model.pkl")
    npz = str(tmp_path / "out.npz")
    _fake_chumpy_pkl(pkl, asset)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_smpl_pkl.py"), pkl, npz],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        timeout=120,
    )
    assert result.returncode == 0, result.stderr
    loaded = assets_lib.load_npz(npz)
    np.testing.assert_allclose(loaded.v_template, asset.v_template, atol=1e-6)


def test_npz_save_load_roundtrip(tmp_path):
    asset = assets_lib.synthetic_asset(num_verts=864, seed=5)
    path = str(tmp_path / "a.npz")
    assets_lib.save_npz(asset, path)
    loaded = assets_lib.load_npz(path)
    for field in ("v_template", "shapedirs", "weights", "parents"):
        np.testing.assert_array_equal(getattr(loaded, field), getattr(asset, field))


def test_shade_mesh_zbuffer_and_shading():
    """Software shaded render: coverage, intensity range, and z-buffer
    (nearer triangle wins where two overlap)."""
    import numpy as np

    from indirect_learning_pose_shape_tpu.predict import shade_mesh

    size = 32
    # Two overlapping triangles at different depths covering the centre.
    verts2d = np.array(
        [[4, 4], [28, 4], [4, 28],      # tri A (z = 0, farther)
         [8, 8], [28, 24], [8, 28]],    # tri B (z = 1, nearer)
        np.float32,
    )
    verts_z = np.array([0, 0, 0, 1, 1, 1], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    img = shade_mesh(verts2d, verts_z, faces, size)
    assert img.shape == (size, size)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert (img > 0).mean() > 0.1  # real coverage
    # Tri B is flat in z but tilted in the normal sense? Both flat: shading
    # differs only via screen-space normals; the z-buffer must keep B where
    # both cover. Pixel (14, 14) is inside both; its value must equal B's
    # flat shade, which is the value at a B-only pixel like (26, 23).
    b_only = img[23, 26]
    assert b_only > 0
    assert abs(img[14, 14] - b_only) < 1e-6
    # A-only pixel keeps A's shade.
    assert img[5, 5] > 0


def test_shade_mesh_empty_faces():
    import numpy as np

    from indirect_learning_pose_shape_tpu.predict import shade_mesh

    img = shade_mesh(
        np.zeros((3, 2), np.float32),
        np.zeros(3, np.float32),
        np.zeros((0, 3), np.int32),
        16,
    )
    assert (img == 0).all()


def test_cache_dir_env_parsing():
    """Boolean-ish tokens must map to the default dir / disabled, never a
    literal ./1 directory (regression: binary jit blobs got committed)."""
    import os

    from indirect_learning_pose_shape_tpu.utils.cache import resolve_cache_dir

    default = os.path.expanduser("~/.cache/ilps_jax_cache")
    for tok in ("1", "true", "ON", "yes "):
        assert resolve_cache_dir(tok) == default
    for tok in ("", "0", "false", "OFF", "no"):
        assert resolve_cache_dir(tok) is None
    assert resolve_cache_dir("/tmp/mycache") == "/tmp/mycache"
    assert resolve_cache_dir("~/x") == os.path.expanduser("~/x")
