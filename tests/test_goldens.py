"""Pinned full-frame golden images.

The reference's closest analog is the F11 screenshot + WARP rasterizer
combo (SURVEY.md section 4): a deterministic CPU render compared by eye.
Here the comparison is automated: each config in
`tools/make_goldens.py::golden_cases` renders 2 animated frames on the
forced-CPU backend and must match the committed .npz within tolerance.
A failing diff means the image changed — regenerate via the tool only
for *intentional* rendering changes.
"""

import os

import numpy as np
import pytest

from tools.make_goldens import GOLDEN_DIR, golden_cases, render_case


@pytest.mark.parametrize(
    "name,cfg,frames,mesh_path", golden_cases(),
    ids=lambda c: c if isinstance(c, str) else ""
)
def test_golden_frame(name, cfg, frames, mesh_path):
    if mesh_path is not None and not os.path.exists(mesh_path):
        pytest.skip(f"{mesh_path} not present")
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden {path}; run tools/make_goldens.py"
    )
    want = np.load(path)["image"].astype(np.float32)
    got = render_case(cfg, frames, mesh_path)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    # display-mapped [0, 1] images; tolerances catch real regressions but
    # ride out XLA fast-math drift
    assert diff.mean() < 2e-3, f"golden {name}: mean {diff.mean():.2e}"
    assert np.percentile(diff, 99.9) < 3e-2, (
        f"golden {name}: p99.9 {np.percentile(diff, 99.9):.2e} "
        f"max {diff.max():.2e}"
    )
