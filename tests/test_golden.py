"""Golden-image regression test (SURVEY.md §4.4): whole-pipeline drift
detection against a checked-in reference render."""

import os

import numpy as np
import pytest

from tpurt.app import Renderer
from tpurt.io.image import read_png, to_uint8
from tpurt.scenes import default_camera_for, teapot_scene
from tpurt.types import Light, RenderConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "teapot_128x96.png")


def _render(use_pallas: bool):
    mesh = teapot_scene(1500)
    r = Renderer(mesh, default_camera_for(mesh),
                 Light.directional((0.45, 0.8, 0.3)),
                 RenderConfig(width=128, height=96, use_pallas=use_pallas,
                              leaf_size=8 if use_pallas else 4, seed=0))
    return np.asarray(r.render_frame()["image"])


@pytest.mark.parametrize("use_pallas", [False, True])
def test_matches_golden(use_pallas):
    golden = read_png(GOLDEN).astype(np.int16)
    img = to_uint8(_render(use_pallas)).astype(np.int16)
    assert img.shape == golden.shape
    diff = np.abs(img - golden)
    # Tolerate tiny fp drift (1 gray level) on most pixels and rare boundary
    # pixels flipping at silhouettes/shadow edges.
    frac_off = (diff > 2).mean()
    assert frac_off < 0.005, f"{frac_off:.4%} pixels differ from golden"
    assert diff.max() <= 255
