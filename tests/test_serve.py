"""Serving worker test: real HTTP round trip with streamed b'\\0'-delimited
JSON chunks on a tiny model."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.infer.chat import ChatModel
from v2pe_tpu.models.params import init_vlm_params
from v2pe_tpu.serve.mm_utils import image_to_base64
from v2pe_tpu.serve.worker import ModelWorker

from .test_data_pipeline import _toy_tokenizer


@pytest.fixture(scope="module")
def worker_server():
    import jax

    tokenizer = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tokenizer), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        rope_pos_id_stride=2, max_dynamic_patch=4,
    )
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    model = ChatModel(params, cfg, tokenizer, attn_impl="jnp")
    worker = ModelWorker(model, model_name="tiny")
    server = worker.make_server(host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", worker
    server.shutdown()


def test_worker_status(worker_server):
    url, worker = worker_server
    req = urllib.request.Request(url + "/worker_get_status", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        status = json.loads(r.read())
    assert status["model_names"] == ["tiny"]


def test_worker_engine_mode_concurrent(worker_server):
    """Engine-backed worker: two concurrent HTTP generations stream
    through the shared continuous-batching engine and both complete with
    the same text the per-request path produces."""
    from v2pe_tpu.serve.engine import InferenceEngine

    url, worker = worker_server

    def fetch(payload):
        req = urllib.request.Request(
            url + "/worker_generate_stream",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            raw = r.read()
        chunks = [json.loads(c) for c in raw.split(b"\0") if c]
        assert all(c["error_code"] == 0 for c in chunks)
        return chunks[-1]["text"] if chunks else ""

    payloads = [{"prompt": "<|im_start|>user\nSay A.<|im_end|>"
                           "<|im_start|>assistant\n",
                 "max_new_tokens": 6, "temperature": 0.0},
                {"prompt": "<|im_start|>user\nCount to three.<|im_end|>"
                           "<|im_start|>assistant\n",
                 "max_new_tokens": 6, "temperature": 0.0}]
    refs = [fetch(p) for p in payloads]        # per-request path

    engine = InferenceEngine(worker.model, max_rows=2, max_len=512,
                             page_size=8, chunk_size=64, decode_block=4)
    worker.engine = engine
    engine.start()
    try:
        results = [None, None]

        def run(i):
            results[i] = fetch(payloads[i])

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert results == refs
    finally:
        worker.engine = None
        engine.stop()


def test_worker_generate_stream(worker_server):
    from PIL import Image

    url, worker = worker_server
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (80, 120, 3),
                                         dtype=np.uint8))
    payload = {
        "prompt": "<|im_start|>user\n<image>\nWhat is this?<|im_end|>"
                  "<|im_start|>assistant\n",
        "images": [image_to_base64(img)],
        "max_new_tokens": 6,
        "temperature": 0.0,
    }
    req = urllib.request.Request(
        url + "/worker_generate_stream",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        raw = r.read()
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert len(chunks) >= 1
    assert all(c["error_code"] == 0 for c in chunks)
    assert isinstance(chunks[-1]["text"], str)


def test_openai_models_route(worker_server):
    url, _ = worker_server
    with urllib.request.urlopen(url + "/v1/models") as r:
        data = json.loads(r.read())
    assert data["data"][0]["id"] == "tiny"


def _post_json(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req)


def test_openai_chat_completion(worker_server):
    """Non-stream /v1/chat/completions: text+image messages produce the
    same text as the native chat path; usage counts include tile tokens."""
    url, worker = worker_server
    from PIL import Image

    img = Image.fromarray(np.random.RandomState(3).randint(
        0, 255, (64, 64, 3), np.uint8))
    data_url = "data:image/png;base64," + image_to_base64(img)

    body = {
        "model": "tiny",
        "messages": [
            {"role": "system", "content": "Be terse."},
            {"role": "user", "content": [
                {"type": "text", "text": "Describe the image."},
                {"type": "image_url", "image_url": {"url": data_url}},
            ]},
        ],
        "max_tokens": 6,
        "temperature": 0.0,
    }
    with _post_json(url + "/v1/chat/completions", body) as r:
        out = json.loads(r.read())
    assert out["object"] == "chat.completion"
    choice = out["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert isinstance(choice["message"]["content"], str)
    assert choice["finish_reason"] in ("stop", "length")
    u = out["usage"]
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    # image tile tokens are counted (4 tiles x num_image_token >> text len)
    assert u["prompt_tokens"] > worker.model.cfg.num_image_token

    # multi-turn: assistant history accepted, last-user required
    body2 = {"messages": [
        {"role": "user", "content": "Hi"},
        {"role": "assistant", "content": choice["message"]["content"]},
        {"role": "user", "content": "Again?"}],
        "max_tokens": 4}
    with _post_json(url + "/v1/chat/completions", body2) as r:
        out2 = json.loads(r.read())
    assert out2["choices"][0]["message"]["content"] is not None

    # malformed: ends with assistant -> 400 invalid_request_error
    bad = {"messages": [{"role": "assistant", "content": "x"}]}
    try:
        _post_json(url + "/v1/chat/completions", bad)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"]["type"] == \
            "invalid_request_error"


def test_openai_chat_completion_stream(worker_server):
    """stream=true: SSE chunks whose deltas concatenate to the non-stream
    content, closed by a finish_reason chunk and data: [DONE]."""
    url, _ = worker_server
    body = {"messages": [{"role": "user", "content": "Tell me a story."}],
            "max_tokens": 6, "stream": True}
    with _post_json(url + "/v1/chat/completions", body) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = r.read().decode()
    lines = [ln[len("data: "):] for ln in raw.split("\n\n")
             if ln.startswith("data: ")]
    assert lines[-1] == "[DONE]"
    chunks = [json.loads(x) for x in lines[:-1]]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)

    body.pop("stream")
    with _post_json(url + "/v1/chat/completions", body) as r:
        ref = json.loads(r.read())["choices"][0]["message"]["content"]
    assert text == ref
