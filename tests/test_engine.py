"""Continuous-batching engine: interleaved multi-request decode over the
shared page pool must reproduce each request's isolated generation
token-for-token, reclaim pages at completion, and admit queued requests
mid-stream."""

import numpy as np
import pytest

import jax

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.infer.chat import ChatModel
from v2pe_tpu.infer.generate import GenerationConfig
from v2pe_tpu.serve.engine import InferenceEngine, PageAllocator


@pytest.fixture(scope="module")
def chat_model():
    from .test_data_pipeline import _toy_tokenizer

    from v2pe_tpu.models.params import init_vlm_params

    tok = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        max_dynamic_patch=2)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return ChatModel(params, cfg, tok, attn_impl="jnp")


def _engine(chat_model, **kw):
    kw.setdefault("max_rows", 2)
    kw.setdefault("max_len", 1024)
    kw.setdefault("page_size", 8)
    kw.setdefault("chunk_size", 64)
    kw.setdefault("decode_block", 4)
    return InferenceEngine(chat_model, **kw)


QUESTIONS = ["Describe the picture.", "What color?", "Count the objects."]


@pytest.mark.slow  # heavy batched-decode compile; token-exactness re-certified every round by dryrun_multichip's engine check
def test_engine_matches_isolated_chat(chat_model):
    """3 requests through a 2-row engine (third queues until a row frees)
    reproduce chat()'s greedy output per request."""
    from PIL import Image

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8))
    pv, _ = chat_model.load_pixels(img)
    gc = GenerationConfig(max_new_tokens=6)

    refs = [chat_model.chat(pv, QUESTIONS[0], gc),
            chat_model.chat(None, QUESTIONS[1], gc),
            chat_model.chat(None, QUESTIONS[2], gc)]

    eng = _engine(chat_model)
    reqs = [eng.submit_chat(pv, QUESTIONS[0], max_new_tokens=6),
            eng.submit_chat(None, QUESTIONS[1], max_new_tokens=6),
            eng.submit_chat(None, QUESTIONS[2], max_new_tokens=6)]
    eng.run_until_idle()
    got = [r.result(timeout=0) for r in reqs]
    assert got == refs


def test_engine_mid_stream_admission(chat_model):
    """A request submitted while another is mid-decode is admitted into a
    free row without disturbing the in-flight generation."""
    gc = GenerationConfig(max_new_tokens=8)
    ref_a = chat_model.chat(None, QUESTIONS[1], gc)
    ref_b = chat_model.chat(None, QUESTIONS[2], gc)

    eng = _engine(chat_model)
    ra = eng.submit_chat(None, QUESTIONS[1], max_new_tokens=8)
    assert eng.step()                      # admit A + first decode block
    assert eng._active.any()
    rb = eng.submit_chat(None, QUESTIONS[2], max_new_tokens=8)
    eng.run_until_idle()
    assert ra.result(timeout=0) == ref_a
    assert rb.result(timeout=0) == ref_b


def test_engine_reclaims_pages(chat_model):
    eng = _engine(chat_model)
    total = eng.allocator.available
    reqs = [eng.submit_chat(None, q, max_new_tokens=5) for q in QUESTIONS]
    eng.run_until_idle()
    assert all(r.finished.is_set() for r in reqs)
    # every page is either back on the free list or parked (evictable)
    # in the prefix cache — none leaked, none still referenced
    assert eng.allocator.available + eng.prefix_cache.evictable == total
    assert np.all(np.asarray(eng.cache.page_table) == -1)
    assert np.all(np.asarray(eng.cache.lengths) == 0)
    # rows reusable: a fourth request still works
    r4 = eng.submit_chat(None, QUESTIONS[0], max_new_tokens=5)
    eng.run_until_idle()
    assert r4.finished.is_set() and isinstance(r4.result(timeout=0), str)


@pytest.mark.slow  # heavy batched-decode compile; eviction/reuse covered by the default admission/eviction tests
def test_engine_row_reuse_matches(chat_model):
    """Requests served on REUSED rows (after earlier retirements wrote and
    freed the same physical pages) still match isolated runs."""
    gc = GenerationConfig(max_new_tokens=7)
    refs = [chat_model.chat(None, q, gc) for q in QUESTIONS * 2]
    eng = _engine(chat_model)
    reqs = [eng.submit_chat(None, q, max_new_tokens=7)
            for q in QUESTIONS * 2]
    eng.run_until_idle()
    assert [r.result(timeout=0) for r in reqs] == refs


def test_engine_streaming_and_thread(chat_model):
    """Background-thread mode: token queue streams and result() blocks
    until completion."""
    eng = _engine(chat_model)
    eng.start()
    try:
        req = eng.submit_chat(None, QUESTIONS[0], max_new_tokens=5)
        text = req.result(timeout=120)
        assert req.finished.is_set()
        toks = []
        while True:
            t = req.token_queue.get(timeout=10)
            if t is None:
                break
            toks.append(t)
        assert toks == req.tokens and 0 < len(toks) <= 5
        assert text == chat_model._decode(np.asarray(toks), len(toks))
    finally:
        eng.stop()


def test_engine_rejects_oversized(chat_model):
    eng = _engine(chat_model, max_len=64)
    with pytest.raises(ValueError):
        eng.submit(np.arange(10), np.arange(10, dtype=np.float32),
                   max_new_tokens=60)


def test_prefix_cache_hit_and_exactness(chat_model):
    """An identical prompt resubmitted after completion reuses the parked
    prefix pages (fewer prefill tokens) and still produces the exact
    isolated-chat output."""
    gc = GenerationConfig(max_new_tokens=6)
    # long first turn so the prompt spans several full 8-token pages
    hist = [("Please remember this long setup. " * 3, "Noted.")]
    ref = chat_model.chat(None, QUESTIONS[0], gc, history=hist)

    eng = _engine(chat_model)
    r1 = eng.submit_chat(None, QUESTIONS[0], max_new_tokens=6, history=hist)
    eng.run_until_idle()
    hits_before = eng.stats["prefix_hit_pages"]
    assert hits_before == 0
    r2 = eng.submit_chat(None, QUESTIONS[0], max_new_tokens=6, history=hist)
    eng.run_until_idle()
    S = len(r2.ids)
    assert eng.stats["prefix_hit_pages"] == (S - 1) // eng.page_size
    assert r1.result(timeout=0) == ref
    assert r2.result(timeout=0) == ref


def test_prefix_cache_shared_while_active(chat_model):
    """Two same-prefix requests IN FLIGHT TOGETHER share physical pages
    (refcount 2) and both match their isolated outputs."""
    gc = GenerationConfig(max_new_tokens=6)
    hist = [("Shared system preamble, quite long indeed. " * 2, "Ok.")]
    refs = [chat_model.chat(None, q, gc, history=hist)
            for q in QUESTIONS[:2]]

    eng = _engine(chat_model)
    # admit the first (creates + registers its prefix pages), then the
    # second while the first is still decoding
    ra = eng.submit_chat(None, QUESTIONS[0], max_new_tokens=6, history=hist)
    assert eng.step()
    rb = eng.submit_chat(None, QUESTIONS[1], max_new_tokens=6, history=hist)
    eng.run_until_idle()
    assert eng.stats["prefix_hit_pages"] > 0
    assert [ra.result(timeout=0), rb.result(timeout=0)] == refs


def test_prefix_cache_respects_positions(chat_model):
    """Same token ids with different V2PE positions must NOT share pages
    (positions shape the stored rotary-applied keys)."""
    eng = _engine(chat_model)
    ids = np.arange(5, 45) % 30 + 4
    pos = np.arange(40, dtype=np.float32)
    eng.submit(ids, pos, max_new_tokens=4)
    eng.run_until_idle()
    eng.submit(ids, pos * 0.5, max_new_tokens=4)   # v2pe-style fractional
    eng.run_until_idle()
    assert eng.stats["prefix_hit_pages"] == 0
    eng.submit(ids, pos, max_new_tokens=4)         # exact repeat DOES hit
    eng.run_until_idle()
    assert eng.stats["prefix_hit_pages"] == (len(ids) - 1) // eng.page_size


def test_prefix_cache_image_content_in_identity(chat_model):
    """Identical prompt text with a DIFFERENT image must not reuse pages,
    and each output matches its isolated run."""
    from PIL import Image

    rng = np.random.RandomState(3)
    img1 = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    img2 = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    gc = GenerationConfig(max_new_tokens=5)
    pv1, _ = chat_model.load_pixels(img1)
    pv2, _ = chat_model.load_pixels(img2)
    refs = [chat_model.chat(pv1, QUESTIONS[0], gc),
            chat_model.chat(pv2, QUESTIONS[0], gc)]

    eng = _engine(chat_model)
    r1 = eng.submit_chat(pv1, QUESTIONS[0], max_new_tokens=5)
    eng.run_until_idle()
    r2 = eng.submit_chat(pv2, QUESTIONS[0], max_new_tokens=5)
    eng.run_until_idle()
    assert eng.stats["prefix_hit_pages"] == 0
    assert [r1.result(timeout=0), r2.result(timeout=0)] == refs
    # same image again: full prefix reuse across the image tokens
    r3 = eng.submit_chat(pv1, QUESTIONS[0], max_new_tokens=5)
    eng.run_until_idle()
    assert eng.stats["prefix_hit_pages"] > 0
    assert r3.result(timeout=0) == refs[0]


def test_prefix_cache_eviction_under_pressure(chat_model):
    """Parked prefix pages are evicted when the free list runs dry; the
    engine keeps serving correctly."""
    gc = GenerationConfig(max_new_tokens=4)
    eng = _engine(chat_model, max_rows=1, max_len=256,
                  pool_tokens=160)      # 20 usable pages of 8
    prompts = [f"Topic {i}: tell me something interesting." for i in range(4)]
    refs = [chat_model.chat(None, p, gc) for p in prompts]
    got = []
    for p in prompts:                    # sequential: each parks its pages
        r = eng.submit_chat(None, p, max_new_tokens=4)
        eng.run_until_idle()
        got.append(r.result(timeout=0))
    assert got == refs
    total = eng.allocator.n_pages - 1
    assert eng.allocator.available + eng.prefix_cache.evictable == total


@pytest.mark.slow  # heavy mesh compile; identical check runs in dryrun_multichip every round
def test_engine_under_seq_mesh_token_exact(chat_model, jax8):
    """The engine constructed inside a (seq=4, tensor=2) mesh context —
    pool physically sharded over the mesh, per-shard page placement —
    reproduces the unsharded engine's outputs exactly, including a
    prefix-cache hit."""
    import jax as _jax
    from jax.sharding import Mesh

    from v2pe_tpu.parallel import context as pctx

    gc = GenerationConfig(max_new_tokens=6)
    refs = [chat_model.chat(None, q, gc) for q in QUESTIONS]
    refs.append(refs[0])                       # repeat → prefix hit

    mesh = Mesh(np.array(_jax.devices()[:8]).reshape(1, 1, 4, 2),
                ("data", "fsdp", "seq", "tensor"))
    with pctx.use_sharding(pctx.ShardingContext(mesh=mesh)):
        eng = _engine(chat_model)
        assert eng.allocator.n_shards == 4
        reqs = [eng.submit_chat(None, q, max_new_tokens=6)
                for q in QUESTIONS + [QUESTIONS[0]]]
        eng.run_until_idle()
    assert [r.result(timeout=0) for r in reqs] == refs
    assert eng.stats["prefix_hit_pages"] > 0


def test_page_allocator():
    a = PageAllocator(8)
    assert a.available == 7                 # page 0 reserved
    p1 = a.alloc(3)
    p2 = a.alloc(4)
    assert a.alloc(1) is None
    assert 0 not in p1 + p2 and len(set(p1 + p2)) == 7
    a.release(p1)
    assert a.available == 3
    assert sorted(a.alloc(3)) == sorted(p1)


def test_page_allocator_sharded():
    a = PageAllocator(16, n_shards=4)       # 4 pages/shard, local 0 null
    assert a.available == 12
    pages = a.alloc(8, first_slot=0)        # slots 0..7 round-robin
    assert [a.shard_of(p) for p in pages] == [0, 1, 2, 3, 0, 1, 2, 3]
    # slot-aligned continuation keeps the invariant
    more = a.alloc(2, first_slot=8)
    assert [a.shard_of(p) for p in more] == [0, 1]
    # shards 0/1 are drained; a 5-slot request at slot 0 needs 2+1 there
    assert a.alloc(5, first_slot=0) is None
    assert a.shortage(5, 0) == {0: 2, 1: 1}
    a.release(pages)
    assert a.alloc(5, first_slot=0) is not None


@pytest.mark.slow  # heavy batched-decode compile; facade plumbing covered by evalkit engine-rows e2e default
def test_engine_chat_facade_matches_chat(chat_model):
    """EngineChat.chat == ChatModel.chat (greedy), incl. image turns,
    history threading, and attribute delegation; threaded run_shard
    through the facade writes the same records as sequential chat."""
    from PIL import Image

    from v2pe_tpu.evalkit import runner
    from v2pe_tpu.serve.engine import EngineChat

    img = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (60, 72, 3), np.uint8))
    pv, _ = chat_model.load_pixels(img)
    gc = GenerationConfig(max_new_tokens=5)

    ec = EngineChat(chat_model, max_rows=2, max_len=1024, page_size=8,
                    chunk_size=64, decode_block=4)
    try:
        # delegation
        assert ec.cfg is chat_model.cfg
        pv2, n2 = ec.load_pixels(img)
        np.testing.assert_array_equal(pv2, pv)

        ref = chat_model.chat(pv, QUESTIONS[0], gc)
        got, hist = ec.chat(pv, QUESTIONS[0], gc, return_history=True)
        assert got == ref
        assert hist[-1][1] == ref

        with pytest.raises(ValueError):
            ec.chat(None, "q", GenerationConfig(do_sample=True))

        # threaded shard through the facade == sequential records
        items = [{"id": i, "q": q} for i, q in enumerate(QUESTIONS)]

        def infer(item):
            return {"id": item["id"],
                    "pred": ec.chat(None, item["q"], gc)}

        out = "/tmp/engine_chat_shard.jsonl"
        import os
        if os.path.exists(out):
            os.remove(out)
        n = runner.run_shard(items, infer, out, workers=3)
        assert n == len(items)
        import json
        recs = {r["id"]: r["pred"]
                for r in map(json.loads, open(out))}
        for it in items:
            assert recs[it["id"]] == chat_model.chat(None, it["q"], gc)
    finally:
        ec.stop()


def test_engine_scheduler_failure_fails_pending(chat_model):
    """If the scheduler loop dies, blocked result() callers get a
    RuntimeError instead of hanging forever (run_shard's failure
    accounting depends on this)."""
    eng = _engine(chat_model)

    def boom():
        raise RuntimeError("injected scheduler failure")

    eng.step = boom
    req = eng.submit_chat(None, "hello", max_new_tokens=4)  # queued first
    eng.start()
    with pytest.raises(RuntimeError, match="failed"):
        req.result(timeout=30)
    assert req.finished.is_set()
    # post-mortem submits fail fast instead of queueing into the void
    with pytest.raises(RuntimeError, match="failed"):
        eng.submit_chat(None, "again", max_new_tokens=4)
    eng.stop()
