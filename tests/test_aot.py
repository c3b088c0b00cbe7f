"""AOT serving artifacts (crossclr_tpu/aot.py): export → file → load →
search, with no config/checkpoint/model code on the load side."""

import numpy as np
import pytest

from crossclr_tpu.aot import SearchArtifact, export_search, save_artifact
from crossclr_tpu.data import SyntheticPairs
from crossclr_tpu.serve import build_service
from crossclr_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    apply_overrides,
)


def _tiny_cfg(**data_kw):
    data_kw = {"num_pairs": 48, **data_kw}
    cfg = ExperimentConfig(data=DataConfig(
        batch_size=16, video_dim=24, text_dim=16, **data_kw
    ))
    return apply_overrides(cfg, [
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
    ])


def _queries(n=5):
    return SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:n]


def test_artifact_matches_service_across_batch_sizes(tmp_path):
    """One export serves any batch size (symbolic b), results equal the
    live service; ids ride along; smaller k slices the sorted columns."""
    service = build_service(_tiny_cfg(), None, "video", random_params=True)
    blob, meta, corpus = export_search(service, k=5)
    assert meta["k"] == 5 and meta["corpus_rows"] == 48
    assert meta["query_side"] == "text" and not meta["with_mask"]
    path = str(tmp_path / "art.npz")
    save_artifact(path, blob, meta, corpus, ids=[f"clip{i}" for i in range(48)])

    art = SearchArtifact.load(path)
    q = _queries(5)
    for n in (1, 3, 5):  # no re-export between batch sizes
        got = art.search(q[:n])
        want = service.search(q[:n], k=5)
        assert got["indices"] == want["indices"]
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want["scores"]), atol=2e-6
        )
        assert got["ids"][0][0] == f"clip{got['indices'][0][0]}"

    # single-query convenience + k slicing
    one = art.search(q[0], k=2)
    assert np.asarray(one["indices"]).shape == (1, 2)
    assert one["indices"][0] == got["indices"][0][:2]

    with pytest.raises(ValueError, match="outside"):
        art.search(q[:1], k=6)
    with pytest.raises(ValueError, match="pooled"):
        art.search(q[:1], mask=np.ones((1, 4), np.float32))


def test_artifact_sequence_tower_with_mask(tmp_path):
    """Masked sequence queries: the artifact signature carries the mask
    and matches the service for full and partial masks."""
    cfg = ExperimentConfig(data=DataConfig(
        num_pairs=48, batch_size=16, video_dim=24, text_dim=16,
        video_seq_len=4, text_seq_len=4,
    ))
    cfg = apply_overrides(cfg, [
        "video_tower.kind=transformer", "video_tower.input_dim=24",
        "video_tower.embed_dim=16", "video_tower.hidden_dim=32",
        "video_tower.num_heads=2", "video_tower.max_seq_len=4",
        "video_tower.dtype=float32",
        "text_tower.kind=transformer", "text_tower.input_dim=16",
        "text_tower.embed_dim=16", "text_tower.hidden_dim=32",
        "text_tower.num_heads=2", "text_tower.max_seq_len=4",
        "text_tower.dtype=float32",
    ])
    service = build_service(cfg, None, "video", random_params=True)
    blob, meta, corpus = export_search(service, k=4, query_shape=(4, 16))
    assert meta["with_mask"]
    path = str(tmp_path / "seq.npz")
    save_artifact(path, blob, meta, corpus)
    art = SearchArtifact.load(path)

    data = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16,
        video_seq_len=4, text_seq_len=4, seed=0,
    )
    q = np.asarray(data.text[:3], np.float32)
    mask = np.ones((3, 4), np.float32)
    mask[:, 2:] = 0.0
    for m in (None, mask):
        got = art.search(q, mask=m)
        want = service.search(q, m, k=4)
        assert got["indices"] == want["indices"]
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want["scores"]), atol=2e-6
        )


def test_artifact_int8_index(tmp_path):
    """An int8-quantized index exports and matches the int8 service
    bitwise (integer accumulation)."""
    service = build_service(
        _tiny_cfg(), None, "video", random_params=True, corpus_dtype="int8"
    )
    blob, meta, corpus = export_search(service, k=3)
    assert meta["index_dtype"] == "int8"
    assert corpus[0].dtype == np.int8  # index keeps its storage dtype
    path = str(tmp_path / "q8.npz")
    save_artifact(path, blob, meta, corpus)
    art = SearchArtifact.load(path)
    q = _queries(4)
    got = art.search(q)
    want = service.search(q, k=3)
    assert got["indices"] == want["indices"]
    np.testing.assert_array_equal(
        np.asarray(got["scores"]), np.asarray(want["scores"])
    )


def test_export_refuses_sharded_corpus():
    service = build_service(
        _tiny_cfg(), None, "video", random_params=True, shard_corpus=True
    )
    with pytest.raises(ValueError, match="sharded"):
        export_search(service, k=3)


def test_export_cli_roundtrip(tmp_path):
    """scripts/export_serving.py writes a loadable artifact with ids."""
    import json

    from crossclr_tpu.utils.config import save_config
    from scripts.export_serving import main as export_main

    cfg_path = tmp_path / "cfg.json"
    save_config(_tiny_cfg(), str(cfg_path))
    out = tmp_path / "art.npz"
    rc = export_main([
        "--config", str(cfg_path), "--random-params",
        "--k", "4", "--output", str(out),
    ])
    assert rc == 0 and out.exists()
    art = SearchArtifact.load(str(out))
    assert art.meta["k"] == 4 and art.meta["corpus_rows"] == 48
    assert json.dumps(art.meta)  # meta stays JSON-serializable
    res = art.search(_queries(2))
    assert np.asarray(res["indices"]).shape == (2, 4)
    s = np.asarray(res["scores"])
    assert np.all(np.isfinite(s)) and np.all(s[:, :-1] >= s[:, 1:] - 1e-7)


def test_artifact_bf16_index_stays_bf16(tmp_path):
    """A bf16 service exports a bf16 index (stored as a uint16 view in
    the npz, NOT folded into fp32 module constants) and matches the
    live bf16 service."""
    import jax.numpy as jnp

    service = build_service(
        _tiny_cfg(), None, "video", random_params=True,
        corpus_dtype="bfloat16",
    )
    blob, meta, corpus = export_search(service, k=3)
    assert meta["index_dtype"] == "bfloat16"
    assert meta["corpus_dtypes"] == ["bfloat16"]
    assert corpus[0].dtype == jnp.bfloat16
    path = str(tmp_path / "bf16.npz")
    save_artifact(path, blob, meta, corpus)
    with np.load(path, allow_pickle=False) as npz:
        assert npz["corpus_0"].dtype == np.uint16  # view storage

    # the index is NOT baked into the module: the serialized blob's size
    # must not scale with the corpus (params are the only constants)
    big = build_service(
        _tiny_cfg(num_pairs=480), None, "video", random_params=True,
        corpus_dtype="bfloat16",
    )
    blob_big, _, corpus_big = export_search(big, k=3)
    assert corpus_big[0].nbytes == 10 * corpus[0].nbytes
    assert abs(len(blob_big) - len(blob)) < 2000

    art = SearchArtifact.load(path)
    q = _queries(4)
    got = art.search(q)
    want = service.search(q, k=3)
    assert got["indices"] == want["indices"]
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(want["scores"]), atol=2e-6
    )


def test_artifact_single_query_mask_convenience(tmp_path):
    """A 1-D mask expands alongside a single (S, D) query, like the
    live service's search does."""
    cfg = ExperimentConfig(data=DataConfig(
        num_pairs=48, batch_size=16, video_dim=24, text_dim=16,
        video_seq_len=4, text_seq_len=4,
    ))
    cfg = apply_overrides(cfg, [
        "video_tower.kind=transformer", "video_tower.input_dim=24",
        "video_tower.embed_dim=16", "video_tower.hidden_dim=32",
        "video_tower.num_heads=2", "video_tower.max_seq_len=4",
        "video_tower.dtype=float32",
        "text_tower.kind=transformer", "text_tower.input_dim=16",
        "text_tower.embed_dim=16", "text_tower.hidden_dim=32",
        "text_tower.num_heads=2", "text_tower.max_seq_len=4",
        "text_tower.dtype=float32",
    ])
    service = build_service(cfg, None, "video", random_params=True)
    blob, meta, corpus = export_search(service, k=3, query_shape=(4, 16))
    path = str(tmp_path / "seq1.npz")
    save_artifact(path, blob, meta, corpus)
    art = SearchArtifact.load(path)

    data = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16,
        video_seq_len=4, text_seq_len=4, seed=0,
    )
    q1 = np.asarray(data.text[0], np.float32)  # (S, D) single query
    m1 = np.asarray([1, 1, 0, 0], np.float32)  # (S,) single mask
    got = art.search(q1, mask=m1)
    want = service.search(q1, m1, k=3)
    assert got["indices"] == want["indices"]


def test_artifact_http_service_matches_live(tmp_path):
    """`serve --artifact` surface: an ArtifactService answers /search
    with scores identical to the live service's on the same queries,
    /healthz and /metrics work, and /reload is cleanly rejected (400 —
    artifacts are immutable)."""
    import json
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from crossclr_tpu.serve import ArtifactService, _make_handler

    service = build_service(_tiny_cfg(), None, "video", random_params=True)
    blob, meta, corpus = export_search(service, k=6)
    path = str(tmp_path / "art.npz")
    save_artifact(path, blob, meta, corpus,
                  ids=[f"clip{i}" for i in range(48)])

    art_service = ArtifactService(SearchArtifact.load(path))
    assert art_service.corpus_rows == 48 and art_service.is_artifact
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(art_service)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path_, payload):
        req = urllib.request.Request(
            url + path_, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        with urllib.request.urlopen(url + "/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok" and health["artifact"] is True
        assert health["corpus_rows"] == 48
        assert health["corpus_side"] == "video"
        assert health["query_side"] == "text"

        q = _queries(3)
        code, got = post("/search", {"features": q.tolist(), "k": 6})
        want = service.search(q, k=6)
        assert code == 200
        assert got["indices"] == want["indices"]
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want["scores"]),
            atol=2e-6,
        )
        assert got["ids"][0][0] == f"clip{got['indices'][0][0]}"

        # k above the baked top-k width clamps (like the live clamp to
        # the corpus size); k=0 keeps the empty-lists contract
        code, clamped = post("/search", {"features": q.tolist(), "k": 99})
        assert code == 200 and len(clamped["indices"][0]) == 6
        code, empty = post("/search", {"features": q.tolist(), "k": 0})
        assert code == 200 and empty["indices"] == [[], [], []]
        assert empty["ids"] == [[], [], []]

        # malformed request is a 400, counted as an error in /metrics
        code, err = post("/search", {"features": "nope"})
        assert code == 400

        code, rejected = post("/reload", {})
        assert code == 400 and "immutable" in rejected["error"]

        with urllib.request.urlopen(url + "/metrics") as resp:
            metrics = json.loads(resp.read())
        assert metrics["search_requests"] == 4
        assert metrics["search_errors"] == 1
        assert metrics["search_dispatches"] == 2  # k=0 + malformed skip
        assert "latency_ms" in metrics
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_serve_cli_artifact(tmp_path):
    """`python -m crossclr_tpu.serve --artifact art.npz` starts with no
    config/checkpoint and serves; conflicting flags are refused."""
    import signal as _signal
    import subprocess
    import sys as _sys
    import threading

    service = build_service(_tiny_cfg(), None, "video", random_params=True)
    blob, meta, corpus = export_search(service, k=4)
    path = str(tmp_path / "art.npz")
    save_artifact(path, blob, meta, corpus)

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from crossclr_tpu.serve import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    # conflicting flags refused before any loading — including the
    # default-valued choices (--corpus/--corpus-dtype), which would
    # otherwise be silently ignored in favor of what was baked at export
    for extra in (["--random-params"], ["--corpus-dtype", "int8"],
                  ["--corpus", "text"]):
        proc = subprocess.run(
            [_sys.executable, "-c", code, "--artifact", path, *extra],
            cwd="/root/repo", capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode != 0, extra
        assert "self-contained" in proc.stderr, (extra, proc.stderr)

    proc = subprocess.Popen(
        [_sys.executable, "-c", code, "--artifact", path, "--port", "0"],
        cwd="/root/repo", stderr=subprocess.PIPE, text=True,
    )
    watchdog = threading.Timer(120, proc.kill)
    watchdog.start()
    try:
        while True:
            line = proc.stderr.readline()
            if "serving" in line:
                banner = line
                break
            if line == "" or proc.poll() is not None:
                raise AssertionError(
                    f"server died before readiness: {proc.communicate()[1]}"
                )
        assert "serving 48 video rows" in banner
        assert "AOT artifact" in banner
        proc.send_signal(_signal.SIGTERM)
        _, rest = proc.communicate(timeout=60)
        assert proc.returncode == 0, rest
        assert "server stopped" in rest
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()
