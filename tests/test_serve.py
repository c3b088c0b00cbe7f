"""Serving tests: the HTTP retrieval service end to end (SURVEY.md §1 —
the reference ships no serving path; this is the online counterpart of
the offline eval CLI)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax.numpy as jnp

from crossclr_tpu.serve import _make_handler, build_service
from crossclr_tpu.utils.config import (
    DataConfig,
    ExperimentConfig,
    apply_overrides,
)


def _tiny_cfg(**data_kw):
    cfg = ExperimentConfig(data=DataConfig(
        num_pairs=48, batch_size=16, video_dim=24, text_dim=16, **data_kw
    ))
    return apply_overrides(cfg, [
        "video_tower.input_dim=24", "video_tower.embed_dim=16",
        "video_tower.hidden_dim=32", "video_tower.dtype=float32",
        "text_tower.input_dim=16", "text_tower.embed_dim=16",
        "text_tower.hidden_dim=32", "text_tower.dtype=float32",
    ])


@pytest.fixture(scope="module")
def server():
    service = build_service(_tiny_cfg(), None, "video", random_params=True)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield service, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/search",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server):
    _, url = server
    with urllib.request.urlopen(url + "/healthz") as resp:
        body = json.loads(resp.read())
    assert resp.status == 200
    assert body == {
        "status": "ok", "corpus_rows": 48,
        "corpus_side": "video", "query_side": "text", "step": 0,
        "index_step": 0,  # encoded at startup from the step-0 tower
    }


def test_search_returns_true_nearest_neighbors(server):
    """Top-1 through HTTP == argmax of the cosine similarity between the
    query's tower embedding and the encoded corpus."""
    from crossclr_tpu.data import SyntheticPairs
    from crossclr_tpu.evaluation import similarity_matrix

    service, url = server
    data = SyntheticPairs(num_pairs=48, video_dim=24, text_dim=16, seed=0)

    status, out = _post(url, {"features": data.text[:3].tolist(), "k": 4})
    assert status == 200
    assert np.asarray(out["indices"]).shape == (3, 4)
    assert np.asarray(out["scores"]).shape == (3, 4)
    assert "ids" not in out  # synthetic corpus has no manifest

    q_emb = service.trainer.encode_modality(
        service.state, service.query_side, data.text[:3]
    )
    sim = similarity_matrix(q_emb, service.corpus_emb)
    expected = np.asarray(jnp.argmax(sim, axis=1))
    np.testing.assert_array_equal(
        [row[0] for row in out["indices"]], expected
    )
    # scores descend within each row
    for row in out["scores"]:
        assert row == sorted(row, reverse=True)


def test_encode_query_matches_dual_path_embeddings(server):
    """The single-tower serving encode equals the paired ``Trainer.encode``
    embeddings for the query modality — same params, same tower."""
    from crossclr_tpu.data import SyntheticPairs

    service, _ = server
    data = SyntheticPairs(num_pairs=48, video_dim=24, text_dim=16, seed=0)
    batch = {"video": data.video[:8], "text": data.text[:8]}

    # dual path runs GSPMD-sharded over the 8-device test mesh, the single
    # path on one device — same math, but XLA fuses differently, so the
    # comparison is tight-tolerance rather than bitwise
    v_dual, t_dual = service.trainer.encode(service.state, batch)
    t_single = service.trainer.encode_modality(
        service.state, service.query_side, data.text[:8]
    )
    np.testing.assert_allclose(
        np.asarray(t_single), np.asarray(t_dual), rtol=1e-5, atol=1e-6
    )

    v_single = service.trainer.encode_modality(
        service.state, "video", batch["video"]
    )
    np.testing.assert_allclose(
        np.asarray(v_single), np.asarray(v_dual), rtol=1e-5, atol=1e-6
    )

    with pytest.raises(ValueError):
        service.trainer.encode_modality(service.state, "audio", batch["video"])


def test_search_request_never_touches_corpus_tower(server):
    """The corpus (video) tower must NOT execute on the request hot path.
    Traces the PRODUCTION fused search function itself (the exact callable
    ``search()`` dispatches — encode + top-k + packing) with jit disabled,
    and asserts every video-tower parameter is an unused input."""
    import jax

    service, _ = server
    state = service.state
    fn = service._search_fn()
    feats = jnp.zeros((2, 16), jnp.float32)  # text input_dim = 16
    corpus = service.corpus_emb

    with jax.disable_jit():  # flat jaxpr of the jitted production fn
        closed = jax.make_jaxpr(
            lambda p, f: fn(p, corpus, f, None, k=4)
        )(state.params, feats)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(
        (state.params, feats)
    )[0]
    invars = closed.jaxpr.invars
    assert len(invars) == len(leaves_with_paths)
    used = set()
    for eqn in closed.jaxpr.eqns:
        for v in eqn.invars:
            if not isinstance(v, jax.extend.core.Literal):
                used.add(v)
    used.update(v for v in closed.jaxpr.outvars if not isinstance(v, jax.extend.core.Literal))

    video_used = text_used = 0
    for (path, _), var in zip(leaves_with_paths, invars):
        name = jax.tree_util.keystr(path)
        if "video_tower" in name and var in used:
            video_used += 1
        if "text_tower" in name and var in used:
            text_used += 1
    assert video_used == 0, f"{video_used} video-tower params consumed"
    assert text_used > 0  # sanity: the query tower really is in the trace


def test_search_k_larger_than_corpus_clamps(server):
    """k beyond the corpus size clamps to the corpus (and the packed
    scores/indices readback splits at the clamped k, not the requested)."""
    _, url = server
    status, out = _post(url, {"features": [0.1] * 16, "k": 500})
    assert status == 200
    idx = np.asarray(out["indices"])
    assert idx.shape == (1, 48)  # corpus has 48 rows
    assert sorted(idx[0].tolist()) == list(range(48))  # a full ranking
    scores = out["scores"][0]
    assert scores == sorted(scores, reverse=True)


def test_search_k_specializations_are_bounded(server):
    """k is static in the fused program and client-controlled: the service
    compiles at the next power of two and slices on host, so a k-sweep
    cannot pile up one multi-second compile per distinct k behind the
    service lock.  Non-pow2 k must still return exactly k sorted rows."""
    service, url = server
    before = service._search_fn()._cache_size()
    ranking = None
    for k in (3, 4, 5, 6, 7, 8):
        status, out = _post(url, {"features": [0.1] * 16, "k": k})
        assert status == 200
        idx, scores = np.asarray(out["indices"]), out["scores"][0]
        assert idx.shape == (1, k)
        assert scores == sorted(scores, reverse=True)
        # every k is a prefix of the same true ranking
        ranking = idx[0].tolist() if ranking is None else ranking
        assert idx[0].tolist()[: min(k, len(ranking))] == ranking[
            : min(k, len(ranking))
        ]
        if k > len(ranking):
            ranking = idx[0].tolist()
    # six distinct ks, only two padded programs (4 and 8)
    assert service._search_fn()._cache_size() - before <= 2

    # the query-row count is padded the same way: distinct batch sizes
    # 3 and 4 share one program (pad to 4), and each response still has
    # exactly the requested number of rows with the same per-query
    # results as a solo request
    from crossclr_tpu.data import SyntheticPairs

    data = SyntheticPairs(num_pairs=48, video_dim=24, text_dim=16, seed=0)
    before = service._search_fn()._cache_size()
    solo = _post(url, {"features": data.text[:1].tolist(), "k": 4})[1]
    for b in (3, 4):
        status, out = _post(
            url, {"features": data.text[:b].tolist(), "k": 4}
        )
        assert status == 200
        assert np.asarray(out["indices"]).shape == (b, 4)
        assert out["indices"][0] == solo["indices"][0]
        assert out["scores"][0] == pytest.approx(solo["scores"][0], abs=1e-5)
    assert service._search_fn()._cache_size() - before <= 1


def test_search_single_query_and_errors(server):
    _, url = server
    status, out = _post(url, {"features": [0.0] * 16, "k": 2})
    assert status == 200 and np.asarray(out["indices"]).shape == (1, 2)

    # k=0 keeps its empty-result contract (no top-1 fallback, no dispatch)
    status, out = _post(url, {"features": [[0.0] * 16, [0.1] * 16], "k": 0})
    assert status == 200
    assert out["indices"] == [[], []] and out["scores"] == [[], []]

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"k": 2})  # missing features
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())

    req = urllib.request.Request(url + "/nope", data=b"{}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 404


def test_search_concurrent_requests_are_consistent(server):
    """ThreadingHTTPServer handles requests on parallel threads; the
    service lock must serialize device work so concurrent searches
    neither crash nor cross results.  Every concurrent response must
    equal the single-threaded response for the same payload."""
    import concurrent.futures

    from crossclr_tpu.data import SyntheticPairs

    _, url = server
    data = SyntheticPairs(num_pairs=48, video_dim=24, text_dim=16, seed=0)
    payloads = [
        {"features": data.text[i : i + 2].tolist(), "k": 3 + (i % 4)}
        for i in range(12)
    ]
    want = [_post(url, p)[1] for p in payloads]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(lambda p: _post(url, p), payloads))
    for (status, out), expected in zip(got, want):
        assert status == 200
        assert out == expected


def test_serve_cli_sigterm_graceful(tmp_path):
    """SIGTERM to the serve CLI: stop accepting, exit 0 ('server stopped'),
    not a traceback — the pod-eviction path."""
    import signal as _signal
    import subprocess
    import sys as _sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from crossclr_tpu.serve import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    proc = subprocess.Popen(
        [
            _sys.executable, "-c", code,
            "--random-params", "--port", "0",
            "data.num_pairs=32", "data.batch_size=16",
            "data.video_dim=24", "data.text_dim=16",
            "video_tower.input_dim=24", "video_tower.embed_dim=16",
            "video_tower.hidden_dim=32", "video_tower.dtype=float32",
            "text_tower.input_dim=16", "text_tower.embed_dim=16",
            "text_tower.hidden_dim=32", "text_tower.dtype=float32",
        ],
        cwd="/root/repo",
        stderr=subprocess.PIPE,
        text=True,
    )
    # watchdog: readline() below blocks, so a wall-clock timer (not the
    # loop condition) enforces the deadline; finally never leaks the child
    watchdog = threading.Timer(120, proc.kill)
    watchdog.start()
    try:
        # wait for the "serving ..." banner (readiness), then SIGTERM
        banner = ""
        while True:
            line = proc.stderr.readline()
            if "serving" in line:
                banner = line
                break
            if line == "" or proc.poll() is not None:
                raise AssertionError(
                    f"server died/killed before readiness: "
                    f"{proc.communicate()[1]}"
                )
        assert "serving 32 video rows" in banner
        proc.send_signal(_signal.SIGTERM)
        _, rest = proc.communicate(timeout=60)
        assert proc.returncode == 0, rest
        assert "server stopped" in rest
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()


def test_eval_embeddings_export_and_precomputed_corpus(tmp_path):
    """`eval --embeddings-output` → `serve --corpus-emb`: the precomputed
    index serves results identical to the encode-at-startup service (the
    startup encode is the dominant cost on large corpora — loading the
    eval CLI's dump must not change a single retrieval)."""
    from crossclr_tpu import eval as eval_cli
    from crossclr_tpu.data import SyntheticPairs
    from crossclr_tpu.utils.config import save_config

    cfg = _tiny_cfg()
    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)
    emb_path = tmp_path / "emb.npz"
    rc = eval_cli.main([
        "--config", str(cfg_path), "--split", "all", "--random-params",
        "--embeddings-output", str(emb_path),
    ])
    assert rc == 0

    with np.load(emb_path) as npz:
        assert npz["video"].shape == (48, 16)
        assert npz["text"].shape == (48, 16)
        assert int(npz["step"]) == 0
        assert str(npz["split"]) == "all"

    pre = build_service(
        cfg, None, "video", random_params=True,
        corpus_emb_path=str(emb_path),
    )
    ref = build_service(cfg, None, "video", random_params=True)
    np.testing.assert_array_equal(
        np.asarray(pre.corpus_emb), np.asarray(ref.corpus_emb)
    )

    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:3]
    assert pre.search(queries, k=4) == ref.search(queries, k=4)


def test_precomputed_corpus_rejects_wrong_embed_dim(tmp_path):
    """A dump whose embedding width does not match the config's towers is
    a startup error, not a garbage index."""
    bad = tmp_path / "bad.npz"
    np.savez(bad, video=np.zeros((48, 8), np.float32), text=np.zeros((48, 8), np.float32))
    with pytest.raises(SystemExit, match=r"expected \[rows, 16\]"):
        build_service(
            _tiny_cfg(), None, "video", random_params=True,
            corpus_emb_path=str(bad),
        )


def test_reload_picks_up_checkpoints_written_after_startup(tmp_path):
    """POST /reload restores a checkpoint a separate training job wrote
    AFTER the service started — queries reflect the new tower, the
    corpus index is re-encoded, and healthz reports the new step.  A
    service without a checkpoint directory refuses (400)."""
    from crossclr_tpu.data import SyntheticPairs, dataset_from_config, epoch_batches
    from crossclr_tpu.training import CheckpointManager, Trainer

    cfg = _tiny_cfg()
    dataset, _ = dataset_from_config(cfg.data)
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=None)
    first = next(epoch_batches(dataset, 16, shuffle=False))
    state = trainer.init_state(first["video"], first["text"])

    ckpt = tmp_path / "ckpt"
    mngr = CheckpointManager(ckpt)
    mngr.save(0, state, wait=True)
    mngr.close()

    service = build_service(cfg, str(ckpt), "video")
    assert service.step == 0
    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:2]
    before = service.search(queries, k=3)

    # a "training job" advances the checkpoint after the service is up
    for _ in range(3):
        state, _ = trainer.train_step(state, first)
    mngr = CheckpointManager(ckpt)
    mngr.save(3, state, wait=True)
    mngr.close()

    assert service.reload() == 3
    assert service.step == 3
    after = service.search(queries, k=3)
    assert before["scores"] != after["scores"]  # new tower, new index

    # the reloaded service == a service built fresh at step 3
    fresh = build_service(cfg, str(ckpt), "video")
    np.testing.assert_array_equal(
        np.asarray(service.corpus_emb), np.asarray(fresh.corpus_emb)
    )
    assert fresh.search(queries, k=3) == after

    # explicit step goes backward too
    assert service.reload(step=0) == 0
    assert service.search(queries, k=3) == before

    # no checkpoint dir -> no reload
    none_svc = build_service(cfg, None, "video", random_params=True)
    with pytest.raises(RuntimeError, match="no checkpoint directory"):
        none_svc.reload()


def test_reload_with_precomputed_corpus_flags_stale_index(tmp_path):
    """/reload on a --corpus-emb service keeps the precomputed index (only
    the query tower moves) — and because the tower and index can now
    disagree, the reload response and /healthz must SAY so instead of
    silently degrading every retrieval."""
    from crossclr_tpu import eval as eval_cli
    from crossclr_tpu.data import dataset_from_config, epoch_batches
    from crossclr_tpu.training import CheckpointManager, Trainer
    from crossclr_tpu.utils.config import save_config

    cfg = _tiny_cfg()
    dataset, _ = dataset_from_config(cfg.data)
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=None)
    first = next(epoch_batches(dataset, 16, shuffle=False))
    state = trainer.init_state(first["video"], first["text"])
    ckpt = tmp_path / "ckpt"
    mngr = CheckpointManager(ckpt)
    mngr.save(0, state, wait=True)
    mngr.close()

    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)
    emb_path = tmp_path / "emb.npz"
    assert eval_cli.main([
        "--config", str(cfg_path), "--split", "all",
        "--checkpoint-dir", str(ckpt),
        "--embeddings-output", str(emb_path),
    ]) == 0

    service = build_service(
        cfg, str(ckpt), "video", corpus_emb_path=str(emb_path)
    )
    assert service.index_step == 0
    assert not service.index_stale

    # a training job writes step 2 after startup; reload picks it up but
    # the precomputed index still dates from step 0
    for _ in range(2):
        state, _ = trainer.train_step(state, first)
    mngr = CheckpointManager(ckpt)
    mngr.save(2, state, wait=True)
    mngr.close()

    frozen = np.asarray(service.corpus_emb)
    assert service.reload() == 2
    np.testing.assert_array_equal(np.asarray(service.corpus_emb), frozen)
    assert service.index_step == 0
    assert service.index_stale

    # the HTTP surfaces carry the signal
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        req = urllib.request.Request(
            url + "/reload", data=b"{}",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            body = json.loads(resp.read())
        assert body["step"] == 2
        assert body["index_step"] == 0
        assert "refresh" in body["warning"]
        with urllib.request.urlopen(url + "/healthz") as resp:
            health = json.loads(resp.read())
        assert health["index_stale"] is True
        assert health["index_step"] == 0
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_shard_corpus_service_matches_single_device(tmp_path):
    """--shard-corpus: the index is row-sharded over the mesh's data axis
    (48 rows over 8 devices: ragged → padded), and every search result
    matches the single-device service up to fp reduction noise."""
    import jax

    from crossclr_tpu.data import SyntheticPairs

    cfg = _tiny_cfg()
    plain = build_service(cfg, None, "video", random_params=True)
    sharded = build_service(
        cfg, None, "video", random_params=True, shard_corpus=True
    )
    assert sharded.mesh is not None
    n_dev = sharded.mesh.shape["data"]
    assert sharded.corpus_rows == 48
    assert sharded.corpus_emb.shape[0] % n_dev == 0  # padded
    assert len(sharded.corpus_emb.sharding.device_set) == n_dev

    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:5]
    for k in (1, 3, 10, 48):
        a = plain.search(queries, k=k)
        b = sharded.search(queries, k=k)
        np.testing.assert_allclose(
            np.asarray(a["scores"]), np.asarray(b["scores"]),
            atol=2e-6, rtol=0,
        )
        # identical indices expected here (scores are well-separated);
        # padded rows must never appear
        assert a["indices"] == b["indices"]
        assert int(np.asarray(b["indices"]).max()) < 48
    # the k=0 contract and healthz row count use the REAL row count
    assert sharded.search(queries, k=0) == plain.search(queries, k=0)
    assert len(jax.devices()) > 1  # guards the shard_corpus precondition


def test_precomputed_index_composes_with_shard_corpus(tmp_path):
    """`--corpus-emb dump.npz --shard-corpus`: the loaded index gets
    row-sharded like an encoded one, and results match the unsharded
    precomputed service."""
    from crossclr_tpu import eval as eval_cli
    from crossclr_tpu.data import SyntheticPairs
    from crossclr_tpu.utils.config import save_config

    cfg = _tiny_cfg()
    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)
    emb_path = tmp_path / "emb.npz"
    assert eval_cli.main([
        "--config", str(cfg_path), "--split", "all", "--random-params",
        "--embeddings-output", str(emb_path),
    ]) == 0

    plain = build_service(
        cfg, None, "video", random_params=True,
        corpus_emb_path=str(emb_path),
    )
    sharded = build_service(
        cfg, None, "video", random_params=True,
        corpus_emb_path=str(emb_path), shard_corpus=True,
    )
    assert sharded.corpus_rows == 48
    n_dev = sharded.mesh.shape["data"]
    assert sharded.corpus_emb.shape[0] % n_dev == 0
    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:4]
    a = plain.search(queries, k=5)
    b = sharded.search(queries, k=5)
    assert a["indices"] == b["indices"]
    np.testing.assert_allclose(
        np.asarray(a["scores"]), np.asarray(b["scores"]), atol=2e-6, rtol=0
    )


def test_bf16_corpus_index(tmp_path):
    """--corpus-dtype bfloat16: the stored index is bf16 (half the HBM),
    scoring still runs in fp32, and results match the fp32 index within
    bf16 rounding; composes with --shard-corpus."""
    from crossclr_tpu.data import SyntheticPairs

    cfg = _tiny_cfg()
    f32 = build_service(cfg, None, "video", random_params=True)
    bf16 = build_service(
        cfg, None, "video", random_params=True, corpus_dtype="bfloat16"
    )
    assert bf16.corpus_emb.dtype == jnp.bfloat16
    assert f32.corpus_emb.dtype == jnp.float32

    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:5]
    a = f32.search(queries, k=3)
    b = bf16.search(queries, k=3)
    np.testing.assert_allclose(
        np.asarray(a["scores"]), np.asarray(b["scores"]), atol=2e-2
    )
    # well-separated synthetic corpus: top-1 is robust to bf16 rounding
    assert [r[0] for r in a["indices"]] == [r[0] for r in b["indices"]]

    both = build_service(
        cfg, None, "video", random_params=True, corpus_dtype="bfloat16",
        shard_corpus=True,
    )
    assert both.corpus_emb.dtype == jnp.bfloat16
    c = both.search(queries, k=3)
    # sharded bf16 == unsharded bf16 up to reduction-order noise
    np.testing.assert_allclose(
        np.asarray(b["scores"]), np.asarray(c["scores"]), atol=2e-6
    )


def test_micro_batching_coalesces_and_matches_serial(tmp_path):
    """--batch-window-ms: concurrent searches coalesce into fewer device
    dispatches, every requester gets exactly its own rows and k, and
    results match the unbatched service."""
    from crossclr_tpu.data import SyntheticPairs

    cfg = _tiny_cfg()
    plain = build_service(cfg, None, "video", random_params=True)
    batched = build_service(
        cfg, None, "video", random_params=True, batch_window_ms=100.0
    )
    assert batched._batcher is not None
    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text

    # warm the compile so the timed window isn't dominated by tracing
    batched.search(queries[:2], k=4)
    base = batched._dispatch_count

    n_req = 6
    results = [None] * n_req
    barrier = threading.Barrier(n_req)

    def worker(i):
        barrier.wait()
        results[i] = batched.search(queries[2 * i : 2 * i + 2], k=2 + i % 3)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_req)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i in range(n_req):
        want = plain.search(queries[2 * i : 2 * i + 2], k=2 + i % 3)
        assert results[i]["indices"] == want["indices"], f"request {i}"
        np.testing.assert_allclose(
            np.asarray(results[i]["scores"]), np.asarray(want["scores"]),
            atol=2e-6,
        )
    coalesced = batched._dispatch_count - base
    assert coalesced < n_req, f"no coalescing: {coalesced} dispatches"

    # the k=0 contract bypasses the batcher entirely
    assert batched.search(queries[:1], k=0) == plain.search(queries[:1], k=0)
    batched._batcher.close()


def test_strict_index_refuses_mismatched_dump(tmp_path):
    """--strict-index: a precomputed index whose encode step disagrees
    with the restored tower is a startup error, not a warning."""
    from crossclr_tpu import eval as eval_cli
    from crossclr_tpu.data import dataset_from_config, epoch_batches
    from crossclr_tpu.training import CheckpointManager, Trainer
    from crossclr_tpu.utils.config import save_config

    cfg = _tiny_cfg()
    dataset, _ = dataset_from_config(cfg.data)
    trainer = Trainer(cfg.video_tower, cfg.text_tower, cfg.train, mesh=None)
    first = next(epoch_batches(dataset, 16, shuffle=False))
    state = trainer.init_state(first["video"], first["text"])
    ckpt = tmp_path / "ckpt"
    mngr = CheckpointManager(ckpt)
    mngr.save(0, state, wait=True)
    mngr.close()

    cfg_path = tmp_path / "cfg.json"
    save_config(cfg, cfg_path)
    emb_path = tmp_path / "emb.npz"
    assert eval_cli.main([
        "--config", str(cfg_path), "--split", "all",
        "--checkpoint-dir", str(ckpt),
        "--embeddings-output", str(emb_path),
    ]) == 0

    # matching step: strict startup succeeds
    ok = build_service(
        cfg, str(ckpt), "video", corpus_emb_path=str(emb_path),
        strict_index=True,
    )
    assert ok.index_step == 0

    # training advances; the dump is now stale -> strict refuses
    state, _ = trainer.train_step(state, first)
    mngr = CheckpointManager(ckpt)
    mngr.save(1, state, wait=True)
    mngr.close()
    with pytest.raises(SystemExit, match="strict-index"):
        build_service(
            cfg, str(ckpt), "video", corpus_emb_path=str(emb_path),
            strict_index=True,
        )


def test_micro_batcher_error_propagation_and_close(tmp_path):
    """A dispatch failure reaches every coalesced waiter; a closed
    batcher rejects new submissions."""
    from crossclr_tpu.serve import _MicroBatcher

    calls = {"n": 0}

    def boom(features, mask, k):
        calls["n"] += 1
        raise RuntimeError("device on fire")

    b = _MicroBatcher(boom, window_ms=50.0, max_batch=8)
    errs = [None, None]

    def worker(i):
        try:
            b.submit(np.zeros((1, 4), np.float32), None, 2)
        except RuntimeError as e:
            errs[i] = str(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == ["device on fire", "device on fire"]
    assert calls["n"] <= 2  # likely coalesced into one failing dispatch

    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((1, 4), np.float32), None, 2)


def test_micro_batcher_stress_mixed_shapes(tmp_path):
    """Many threads, random row counts and k, pooled AND masked-sequence
    query shapes interleaved: every response matches the unbatched
    service (incompatible shapes must never coalesce into one array)."""
    from crossclr_tpu.data import SyntheticPairs

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
    plain = build_service(cfg, None, "video", random_params=True)
    batched = build_service(
        cfg, None, "video", random_params=True, batch_window_ms=20.0
    )
    data = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16,
        video_seq_len=4, text_seq_len=4, seed=0,
    )
    rng = np.random.default_rng(7)
    n_req = 24
    reqs = []
    for i in range(n_req):
        b = int(rng.integers(1, 4))
        start = int(rng.integers(0, 48 - b))
        feats = np.asarray(data.text[start:start + b], np.float32)
        if i % 2:
            mask = np.ones(feats.shape[:2], np.float32)
            mask[:, int(rng.integers(1, feats.shape[1])):] = 0.0
        else:
            mask = None
        reqs.append((feats, mask, int(rng.integers(1, 9))))

    # warm both services on every (ndim, mask) class so the stress loop
    # measures threading, not compiles
    for feats, mask, k in reqs[:2]:
        plain.search(feats, mask, k=k)
        batched.search(feats, mask, k=k)

    results = [None] * n_req
    barrier = threading.Barrier(n_req)

    def worker(i):
        feats, mask, k = reqs[i]
        barrier.wait()
        results[i] = batched.search(feats, mask, k=k)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_req)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (feats, mask, k) in enumerate(reqs):
        want = plain.search(feats, mask, k=k)
        assert results[i]["indices"] == want["indices"], f"request {i}"
        np.testing.assert_allclose(
            np.asarray(results[i]["scores"]), np.asarray(want["scores"]),
            atol=2e-6, err_msg=f"request {i}",
        )
    batched._batcher.close()


def test_search_runtime_faults_are_500_not_400(server):
    """A device/runtime failure on the /search hot path (XlaRuntimeError
    subclasses RuntimeError) must surface as a 500 server fault; only
    malformed requests are 400s."""
    service, url = server
    orig = service.search
    service.search = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("RESOURCE_EXHAUSTED: HBM OOM")
    )
    try:
        _post(url, {"features": [[0.0] * 16]})
        raise AssertionError("expected HTTP 500")
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "RESOURCE_EXHAUSTED" in json.loads(e.read())["error"]
    finally:
        service.search = orig
    # malformed request on the untouched service: still a 400
    try:
        _post(url, {"wrong_key": []})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_metrics_endpoint(tmp_path):
    """GET /metrics: request counts, error counts, and the recent-latency
    percentiles — observability for the serving hot path."""
    service = build_service(_tiny_cfg(), None, "video", random_params=True)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        from crossclr_tpu.data import SyntheticPairs

        queries = SyntheticPairs(
            num_pairs=48, video_dim=24, text_dim=16, seed=0
        ).text[:2]
        for _ in range(3):
            _post(url, {"features": np.asarray(queries).tolist(), "k": 2})
        try:  # missing key -> counted as a search error
            _post(url, {"oops": 1})
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # malformed JSON body -> ALSO counted (same failed-search class)
        req = urllib.request.Request(
            url + "/search", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(url + "/metrics") as resp:
            m = json.loads(resp.read())
        assert m["search_requests"] == 5
        assert m["search_errors"] == 2
        assert m["latency_ms"]["window"] == 3
        assert m["latency_ms"]["p50"] > 0
        assert m["corpus_rows"] == 48 and m["step"] == 0
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_reload_endpoint_over_http(server):
    """The HTTP surface: /reload on a --random-params service is a clean
    400, and healthz carries the step field."""
    _, url = server
    req = urllib.request.Request(
        url + "/reload", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "no checkpoint directory" in json.loads(e.read())["error"]


def test_int8_corpus_index():
    """--corpus-dtype int8: the stored index is a QuantizedCorpus (4x
    less HBM than fp32), results match the fp32 index within the
    quantization bound, and it composes with --shard-corpus (bitwise:
    int8 accumulation has no reduction-order noise)."""
    from crossclr_tpu.data import SyntheticPairs
    from crossclr_tpu.evaluation import QuantizedCorpus

    cfg = _tiny_cfg()
    f32 = build_service(cfg, None, "video", random_params=True)
    q8 = build_service(
        cfg, None, "video", random_params=True, corpus_dtype="int8"
    )
    assert isinstance(q8.corpus_emb, QuantizedCorpus)
    assert q8.corpus_emb.values.dtype == jnp.int8
    assert q8.corpus_rows == f32.corpus_rows

    queries = SyntheticPairs(
        num_pairs=48, video_dim=24, text_dim=16, seed=0
    ).text[:5]
    a = f32.search(queries, k=3)
    b = q8.search(queries, k=3)
    np.testing.assert_allclose(
        np.asarray(a["scores"]), np.asarray(b["scores"]), atol=3e-2
    )
    # well-separated synthetic corpus: top-1 is robust to int8 rounding
    assert [r[0] for r in a["indices"]] == [r[0] for r in b["indices"]]

    both = build_service(
        cfg, None, "video", random_params=True, corpus_dtype="int8",
        shard_corpus=True,
    )
    assert isinstance(both.corpus_emb, QuantizedCorpus)
    n_dev = both.mesh.shape["data"]
    assert both.corpus_emb.values.shape[0] % n_dev == 0
    c = both.search(queries, k=3)
    assert b["indices"] == c["indices"]
    np.testing.assert_array_equal(
        np.asarray(b["scores"]), np.asarray(c["scores"])
    )

    # /healthz reports the storage dtype
    import json as _json

    h = {"corpus_dtype": str(q8.corpus_dtype)}
    assert _json.dumps(h)  # serializable
    assert str(q8.corpus_dtype) == "int8"
