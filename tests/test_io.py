"""PLY round-trip and sample-data ingest tests."""
import os

import numpy as np
import pytest

from plade_tpu.io.ply import read_ply, write_ply

SAMPLE_DIR = "/root/reference/sample_data"


def test_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "x.ply")
    write_ply(path, pts, nrm, binary=True)
    p2, n2 = read_ply(path)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    np.testing.assert_allclose(n2, nrm, rtol=1e-6)


def test_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    path = str(tmp_path / "a.ply")
    write_ply(path, pts, None, binary=False)
    p2, n2 = read_ply(path)
    assert n2 is None
    np.testing.assert_allclose(p2, pts, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(SAMPLE_DIR), reason="no sample data")
def test_read_sample_plys():
    for name, n_expected in [("room_target.ply", 94052),
                             ("polyhedron_target.ply", 100000),
                             ("polyhedron_source.ply", 100000)]:
        pts, nrm = read_ply(os.path.join(SAMPLE_DIR, name))
        assert pts.shape == (n_expected, 3)
        assert nrm is not None and nrm.shape == (n_expected, 3)
        norms = np.linalg.norm(nrm, axis=1)
        assert np.all(np.isfinite(pts))
        assert np.percentile(np.abs(norms - 1.0), 95) < 0.05
