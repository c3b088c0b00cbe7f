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
        "corpus_side": "video", "query_side": "text",
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

    q_emb = service._encode_query(data.text[:3], None)
    sim = similarity_matrix(q_emb, service.corpus_emb)
    expected = np.asarray(jnp.argmax(sim, axis=1))
    np.testing.assert_array_equal(
        [row[0] for row in out["indices"]], expected
    )
    # scores descend within each row
    for row in out["scores"]:
        assert row == sorted(row, reverse=True)


def test_search_single_query_and_errors(server):
    _, url = server
    status, out = _post(url, {"features": [0.0] * 16, "k": 2})
    assert status == 200 and np.asarray(out["indices"]).shape == (1, 2)

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"k": 2})  # missing features
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())

    req = urllib.request.Request(url + "/nope", data=b"{}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 404
