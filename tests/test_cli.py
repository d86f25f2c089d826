"""CLI tests mirroring the reference's two usage modes (main.cpp:30-159)."""
import os

import numpy as np
import pytest

from plade_tpu.cli.main import main
from plade_tpu.io.ply import write_ply
from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud

from test_pipeline import SMALL_CFG  # reuse the small-shape config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_scene")
    rng = np.random.default_rng(0)
    pts, nrm, _ = make_room(rng, n_per_plane=1200, noise=0.002, extra_planes=3)
    R, t = random_rigid(rng, max_angle=1.5, max_trans=1.0)
    spts, snrm = transform_cloud(pts, nrm, R.T, -R.T @ t)
    tgt = str(d / "target.ply")
    src = str(d / "source.ply")
    write_ply(tgt, pts, nrm)
    write_ply(src, spts, snrm)
    return d, tgt, src, R, t


def _patch_small_cfg(monkeypatch):
    import plade_tpu.cli.main as climod
    import plade_tpu.core.config as cfgmod
    monkeypatch.setattr(cfgmod, "PladeConfig",
                        lambda **kw: SMALL_CFG)


def test_single_pair_mode(scene, monkeypatch):
    d, tgt, src, R, t = scene
    _patch_small_cfg(monkeypatch)
    out = str(d / "result.txt")
    rc = main([tgt, src, out])
    assert rc == 0
    text = open(out).read()
    assert f"target: {tgt}" in text and f"source: {src}" in text
    assert "transformation:" in text
    rows = [l.split() for l in text.splitlines()[3:7]]
    T = np.asarray(rows, np.float64)
    assert np.allclose(T[3], [0, 0, 0, 1])
    c = (np.trace(R.T @ T[:3, :3]) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0


def test_batch_mode_with_missing_file(scene, monkeypatch, capsys):
    d, tgt, src, R, t = scene
    _patch_small_cfg(monkeypatch)
    pairs = str(d / "pairs.txt")
    with open(pairs, "w") as f:
        f.write(f"{tgt}\n{src}\n")
        f.write(f"{d}/nonexistent.ply\n")  # skipped with a warning
    out = str(d / "batch_results.txt")
    rc = main([pairs, out])
    assert rc == 0
    text = open(out).read()
    assert text.count("transformation:") == 1
    err = capsys.readouterr().err
    assert "doesn't exist" in err


def test_usage_error():
    with pytest.raises(SystemExit):
        main(["only-one-path"])


def test_batch_resume_skips_completed(scene, monkeypatch, capsys):
    d, tgt, src, R, t = scene
    _patch_small_cfg(monkeypatch)
    pairs = str(d / "pairs_resume.txt")
    with open(pairs, "w") as f:
        f.write(f"{tgt}\n{src}\n")
    out = str(d / "resume_results.txt")
    state = out + ".state.jsonl"
    # pre-seed the state file with a fake completed result: resume must
    # reuse it without re-running the pipeline.  The header must carry the
    # run key (config/seed/pairs fingerprint) or the state is discarded.
    import json

    from plade_tpu.cli.main import _run_key
    from plade_tpu.core.config import PladeConfig
    run_key = _run_key(PladeConfig(), 0, [(tgt, src)])
    fakeT = np.diag([1.0, 1.0, 1.0, 1.0])
    with open(state, "w") as f:
        f.write(json.dumps({"run_key": run_key}) + "\n")
        f.write(json.dumps({"target": tgt, "source": src,
                            "T": fakeT.tolist(), "ok": True}) + "\n")
    rc = main(["--resume", pairs, out])
    assert rc == 0
    err = capsys.readouterr().err
    assert "resuming: 1 pairs" in err
    text = open(out).read()
    rows = [l.split() for l in text.splitlines()[3:7]]
    T = np.asarray(rows, np.float64)
    assert np.allclose(T, fakeT)  # the checkpointed matrix, not a re-run
    assert not os.path.exists(state)  # clean finish drops the checkpoint


def test_batch_resume_retries_failed_and_discards_stale(scene, monkeypatch,
                                                        capsys):
    """Pairs checkpointed with ok=False must be re-run, and a state file
    written under a different config/seed/pair list must be discarded."""
    d, tgt, src, R, t = scene
    _patch_small_cfg(monkeypatch)
    pairs = str(d / "pairs_retry.txt")
    with open(pairs, "w") as f:
        f.write(f"{tgt}\n{src}\n")
    out = str(d / "retry_results.txt")
    state = out + ".state.jsonl"
    import json

    from plade_tpu.cli.main import _run_key
    from plade_tpu.core.config import PladeConfig
    run_key = _run_key(PladeConfig(), 0, [(tgt, src)])
    # ok=False record: must NOT be treated as done
    with open(state, "w") as f:
        f.write(json.dumps({"run_key": run_key}) + "\n")
        f.write(json.dumps({"target": tgt, "source": src,
                            "T": np.eye(4).tolist(), "ok": False}) + "\n")
    rc = main(["--resume", pairs, out])
    assert rc == 0
    err = capsys.readouterr().err
    assert "resuming" not in err            # nothing counted as completed
    rows = [l.split() for l in open(out).read().splitlines()[3:7]]
    T = np.asarray(rows, np.float64)
    assert not np.allclose(T, np.eye(4))    # actually re-registered

    # stale run_key: whole state discarded, pair re-run
    with open(state, "w") as f:
        f.write(json.dumps({"run_key": "deadbeef"}) + "\n")
        f.write(json.dumps({"target": tgt, "source": src,
                            "T": np.eye(4).tolist(), "ok": True}) + "\n")
    rc = main(["--resume", pairs, out])
    assert rc == 0
    err = capsys.readouterr().err
    assert "different config" in err
    rows = [l.split() for l in open(out).read().splitlines()[3:7]]
    T = np.asarray(rows, np.float64)
    assert not np.allclose(T, np.eye(4))


def test_view_export(scene, monkeypatch, tmp_path):
    d, tgt, src, R, t = scene
    _patch_small_cfg(monkeypatch)
    res = str(d / "result.txt")
    if not os.path.exists(res):
        assert main([tgt, src, res]) == 0
    prefix = str(tmp_path / "view")
    rc = main(["view", res, prefix])
    assert rc == 0
    from plade_tpu.io.ply import read_ply
    tp, _ = read_ply(prefix + "_target.ply")
    sp2, _ = read_ply(prefix + "_source_registered.ply")
    # registered source should lie near the target (same scene)
    assert tp.shape[1] == 3 and sp2.shape[1] == 3
    assert np.linalg.norm(sp2.mean(0) - tp.mean(0)) < 0.5


def test_view_html_interactive(scene, monkeypatch, tmp_path):
    """`view RES OUT.html` emits the self-contained interactive WebGL
    viewer (the ResultViewer equivalent, main.cpp:37-95): embedded base64
    point buffers decode to the pair's clouds with the source transformed
    by the recorded matrix."""
    import base64
    d, tgt, src, R, t = scene
    _patch_small_cfg(monkeypatch)
    res = str(d / "result.txt")
    if not os.path.exists(res):
        assert main([tgt, src, res]) == 0
    out = str(tmp_path / "view.html")
    rc = main(["view", res, out])
    assert rc == 0
    html = open(out).read()
    assert "<canvas" in html and "webgl" in html
    assert "http" not in html.split("<script>")[1]  # no external fetches
    from plade_tpu.cli.viewer import _parse_results
    _, _, T = _parse_results(res)

    def decode(marker):
        b64 = html.split(f'{marker}="')[1].split('"')[0]
        return np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 3)

    tp_emb = decode("TGT_P")
    sp_emb = decode("SRC_P")
    from plade_tpu.io.ply import read_ply
    tp, _ = read_ply(tgt)
    sp, _ = read_ply(src)
    assert tp_emb.shape[0] == tp.shape[0]  # below cap: no subsample
    sp_expect = sp @ T[:3, :3].T + T[:3, 3]
    assert np.allclose(sp_emb, sp_expect, atol=1e-4)
