"""Spatial (H-axis) sharding of extraction over the 8-device CPU mesh:
the SPMD-partitioned program must match the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp

from posfeat_tpu.models import PoSFeat
from posfeat_tpu.parallel import shard_image_spatial, spatial_extract, spatial_mesh

SMALL = {
    "backbone": "ResUNet",
    "backbone_config": {
        "encoder": "resnet18",
        "pretrained": False,
        "coarse_out_ch": 32,
        "fine_out_ch": 32,
    },
    "localheader": "KeypointDet",
    "localheader_config": {"in_channels": 96, "prior": "identity", "act": "Softplus"},
    "align_local_grad": False,
    "local_input_elements": ["local_map", "local_map_small"],
    "local_with_img": True,
}


def _cpu8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return devs[:8]


def test_spatial_extract_matches_single_device(rng):
    model = PoSFeat(SMALL, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3))

    # H = 256 -> H/16 = 16 = 2 rows per device on the 8-way mesh
    cpus = _cpu8()
    im = jax.device_put(
        jnp.asarray(rng.rand(1, 256, 128, 3).astype(np.float32)), cpus[0]
    )
    variables = jax.device_put(variables, cpus[0])

    ref = model.extract(variables, im, train=False)

    mesh = spatial_mesh(cpus)
    fn = spatial_extract(model, mesh)
    out = fn(variables, shard_image_spatial(im, mesh))

    for k in ("local_map", "local_point", "global_map"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-5
        )


def test_spatial_extract_tall_image(rng):
    """The Aachen use case this module exists for (SURVEY §5): a tall
    (≥1536 px) image through the full sharded pipeline — halo exchanges
    across 12 row-blocks per device — must match the single-device
    program's keypoints, scores AND descriptors."""
    from posfeat_tpu.ops.detect import generate_kpts_single
    from posfeat_tpu.ops.grid_sample import sample_feat_by_coord

    model = PoSFeat(SMALL, dtype=jnp.float32)
    cpus = _cpu8()
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3)), cpus[0]
    )
    # 1536×256: realistic Aachen height (extract_aachen.yaml budgets
    # 20480 pts at up to ~1600 px); W kept modest for CPU-mesh runtime
    im = jax.device_put(
        jnp.asarray(rng.rand(1, 1536, 256, 3).astype(np.float32)), cpus[0]
    )

    def post(outputs):
        coord_n, score, valid = generate_kpts_single(
            outputs["local_point"], num_pts=1024, nms_radius=1, use_nms=True
        )
        feat = sample_feat_by_coord(outputs["local_map"], coord_n, norm=True)
        return coord_n, score, feat, valid

    mesh = spatial_mesh(cpus)
    fn = spatial_extract(model, mesh, postprocess=post)
    coord_n, score, feat, valid = fn(variables, shard_image_spatial(im, mesh))

    ref_out = model.extract(variables, im, train=False)
    r_coord, r_score, r_valid = generate_kpts_single(
        ref_out["local_point"], num_pts=1024, nms_radius=1, use_nms=True
    )
    r_feat = sample_feat_by_coord(ref_out["local_map"], r_coord, norm=True)

    assert int(valid[0]) == int(r_valid[0])

    # order-independent comparison keyed on coordinates (top-k tie order
    # can differ under sharded reduction): sort both slates by (y, x)
    # and compare scores AND sampled descriptors pointwise
    def ordered(c, s, f):
        c, s, f = np.asarray(c)[0], np.asarray(s)[0], np.asarray(f)[0]
        idx = np.lexsort((c[:, 1], c[:, 0]))
        return c[idx], s[idx], f[idx]

    c1, s1, f1 = ordered(coord_n, score, feat)
    c2, s2, f2 = ordered(r_coord, r_score, r_feat)
    np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(f1, f2, rtol=1e-3, atol=1e-4)


def test_spatial_extract_with_detector(rng):
    """Detector + descriptor sampling inside the sharded program."""
    from posfeat_tpu.ops.detect import generate_kpts_single
    from posfeat_tpu.ops.grid_sample import sample_feat_by_coord

    model = PoSFeat(SMALL, dtype=jnp.float32)
    cpus = _cpu8()
    variables = jax.device_put(
        model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3)), cpus[0]
    )
    im = jax.device_put(
        jnp.asarray(rng.rand(1, 256, 128, 3).astype(np.float32)), cpus[0]
    )

    def post(outputs):
        coord_n, score, valid = generate_kpts_single(
            outputs["local_point"], num_pts=256, nms_radius=1, use_nms=True
        )
        feat = sample_feat_by_coord(outputs["local_map"], coord_n, norm=True)
        return coord_n, score, feat, valid

    mesh = spatial_mesh(cpus)
    fn = spatial_extract(model, mesh, postprocess=post)
    coord_n, score, feat, valid = fn(variables, shard_image_spatial(im, mesh))

    ref_out = model.extract(variables, im, train=False)
    r_coord, r_score, r_valid = generate_kpts_single(
        ref_out["local_point"], num_pts=256, nms_radius=1, use_nms=True
    )

    # top-k ordering between near-equal scores can differ with sharded
    # reduction order — compare the keypoint SETS, not their order
    def ordered(c, s):
        c, s = np.asarray(c)[0], np.asarray(s)[0]
        idx = np.lexsort((c[:, 1], c[:, 0]))
        return c[idx], s[idx]

    c1, s1 = ordered(coord_n, score)
    c2, s2 = ordered(r_coord, r_score)
    np.testing.assert_allclose(c1, c2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-5)
    assert feat.shape[-1] == SMALL["backbone_config"]["fine_out_ch"]


def test_extractor_spatial_product_route(tmp_path, rng):
    """The PRODUCT path (VERDICT r3 item 6): an Extractor config with
    `spatial_shard: auto` must route images above spatial_threshold_px
    through the H-sharded SPMD program and produce the same feature
    files as the unsharded run."""
    import os
    import sys

    import cv2

    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e import make_mini_hpatches

    from posfeat_tpu.extract import Extractor

    data_root = str(tmp_path / "hp")
    os.makedirs(data_root)
    # 384x160 = 61k px: above the 40k test threshold -> spatial route
    make_mini_hpatches(data_root, n_seq=1, n_img=2, h=384, w=160)

    base = {
        "postfix": "sp",
        "load_path": None,
        "loss_distance": "cos",
        "output_desc": True,
        "output_img": False,
        "model": "PoSFeat",
        "model_config": SMALL,
        "data": "HPatch_SIFT",
        "data_config_extract": {
            "data_path": data_root, "batch_size": 2, "workers": 2,
        },
        "local_thr": 0.99,
        "use_sift": False,
        "detector": "generate_kpts_single",
        "detector_config": {
            "num_pts": 256, "stable": True, "use_nms": True,
            "nms_radius": 1, "thr": False,
        },
    }
    e_plain = Extractor(
        {**base, "output_root": "plain"}, ckpt_root=str(tmp_path / "ck")
    )
    e_plain.extract()

    e_sp = Extractor(
        {
            **base,
            "output_root": "sharded",
            "spatial_shard": "auto",
            "spatial_threshold_px": 40_000,
        },
        ckpt_root=str(tmp_path / "ck"),
    )
    assert e_sp._spatial_mesh is not None
    assert e_sp._use_spatial((384, 160)) and not e_sp._use_spatial((160, 160))
    # share weights so outputs are comparable
    e_sp.variables = e_plain.variables
    e_sp.extract()

    import glob

    plain_files = sorted(glob.glob(str(tmp_path / "ck/plain/desc/*/*.sp")))
    assert plain_files
    for pf in plain_files:
        sf = pf.replace("/plain/", "/sharded/")
        a, b = np.load(pf), np.load(sf)
        # order-independent: sharded-reduction tie order may differ
        ia = np.lexsort((a["keypoints"][:, 1], a["keypoints"][:, 0]))
        ib = np.lexsort((b["keypoints"][:, 1], b["keypoints"][:, 0]))
        np.testing.assert_allclose(
            a["keypoints"][ia], b["keypoints"][ib], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            a["descriptors"][ia], b["descriptors"][ib], rtol=1e-3, atol=1e-3
        )
