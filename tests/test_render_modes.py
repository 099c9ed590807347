"""Display render modes: the reference's render-type enum surface
(grey/normals/confidence/color; reference: VisualisationEngine.hpp:12-109,
pixel shaders VisualisationEngine_Shared.hpp:272-498).  Grey and normals
are covered by the pipeline tests; this pins CONFIDENCE (round-4 VERDICT
missing #4)."""

import jax.numpy as jnp
import numpy as np

from topfusion_tpu.config import tiny_test_config
from topfusion_tpu.io.synthetic import SyntheticScene
from topfusion_tpu.models.block_pipeline import BlockPipeline
from topfusion_tpu.ops.rendering import render_confidence_rgb


def test_confidence_rgb_ramp():
    # weight 0 -> pure red, max_weight -> pure green, miss -> black.
    conf = jnp.asarray([[0.0, 50.0, 100.0, 100.0]])
    hit = jnp.asarray([[True, True, True, False]])
    img = np.asarray(render_confidence_rgb(conf, hit, 100.0))
    assert img.shape == (1, 4, 3)
    assert img[0, 0, 0] == 255 and img[0, 0, 1] == 0
    assert img[0, 2, 0] == 0 and img[0, 2, 1] == 255
    assert abs(int(img[0, 1, 0]) - 127) <= 1
    assert (img[0, 3] == 0).all()
    assert (img[..., 2] == 0).all()


def test_pipeline_confidence_render_tracks_fusion_weight():
    cfg = tiny_test_config()
    pipe = BlockPipeline(cfg)
    state = pipe.init()
    depth = SyntheticScene().render_depth_mm(cfg.camera, jnp.eye(4))

    state, _ = pipe.step(state, depth)
    early = np.asarray(pipe.render_confidence(state)).astype(np.int32)
    for _ in range(8):
        state, _ = pipe.step(state, depth)
    late = np.asarray(pipe.render_confidence(state)).astype(np.int32)

    hit_e = early.any(axis=-1)
    hit_l = late.any(axis=-1)
    assert hit_e.mean() > 0.2 and hit_l.mean() > 0.2
    both = hit_e & hit_l
    # Repeated fusion of the same view raises the weight: the heatmap
    # must shift red -> green on the static surface.
    g_shift = (late[..., 1] - early[..., 1])[both].mean()
    r_shift = (late[..., 0] - early[..., 0])[both].mean()
    # 9 fused frames at max_weight=100 -> ~+23 green per surviving pixel
    # (measured 19.6 mean over all hit pixels incl. edges).
    assert g_shift > 15.0
    assert r_shift < -15.0
