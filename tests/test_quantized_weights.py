"""Int8 weight-only quantized serving (ops/quantized_matmul.py).

Beyond-reference (the reference serves fp16 weights, model_worker.py:66-77):
per-output-channel symmetric int8 weights with in-VMEM dequantization.
Contracts checked here:

* the Pallas kernel (interpret mode on CPU) is numerically identical to the
  pjit-fallback jnp dequant dot (same bf16 contraction, scale after);
* quantization error is bounded by the per-channel step size;
* odd output widths (the 92553 vocab head) are padded at quantize time and
  sliced back exactly;
* a quantized model decodes through every serving surface — generate
  (dense + paged), ChatSession, InferenceEngine — and under the mesh the
  seq-sharded engine reproduces the single-device quantized streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.infer.chat import ChatModel
from v2pe_tpu.infer.generate import GenerationConfig, generate
from v2pe_tpu.models import internlm2
from v2pe_tpu.models.params import init_llm_params, init_vlm_params
from v2pe_tpu.ops.quantized_matmul import (QuantizedWeight,
                                           quantize_llm_params,
                                           quantize_weight, quantized_dot)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 192)) * 0.1
    qw = quantize_weight(w)
    deq = qw.q[:, :qw.n_out].astype(jnp.float32) * qw.scale[:, :qw.n_out]
    step = qw.scale[0, :qw.n_out]
    assert float(jnp.max(jnp.abs(deq - w) / step)) <= 0.5 + 1e-6


def test_odd_width_padded_and_sliced():
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 93)) * 0.05
    qw = quantize_weight(w)
    assert qw.q.shape == (128, 128) and qw.n_out == 93
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 128), jnp.bfloat16)
    out = quantized_dot(x, qw)
    assert out.shape == (5, 93)
    ref = jnp.dot(x.astype(jnp.float32), w)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.05


def test_kernel_matches_jnp_fallback():
    """Interpret-mode Pallas == the sharded-path jnp dequant, bit-for-bit
    modulo accumulation order (tolerance 0 observed on CPU)."""
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 384)) * 0.2
    qw = quantize_weight(w)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 256), jnp.bfloat16)
    out_kernel = quantized_dot(x, qw)
    deq = jnp.dot(x.reshape(-1, 256).astype(jnp.bfloat16),
                  qw.q.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * qw.scale
    out_jnp = deq[:, :qw.n_out].reshape(2, 9, -1).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(out_kernel, np.float32),
                               np.asarray(out_jnp, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_scan_slices_quantized_layers():
    """QuantizedWeight children ride lax.scan's leading-axis slicing."""
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 32, 64)) * 0.1
    qw = quantize_weight(w)

    def body(_, lp):
        assert lp.q.shape == (32, 128) and lp.n_out == 64  # lane-padded
        return None, lp.scale.sum()

    _, sums = jax.lax.scan(body, None, qw)
    np.testing.assert_allclose(np.asarray(sums),
                               np.asarray(qw.scale.sum(axis=(1, 2))),
                               rtol=1e-6)


def test_stacked_kernel_matches_per_layer_dot():
    """The scalar-prefetch stacked kernel (the decode scan's no-copy path)
    reproduces per-layer ``quantized_dot`` exactly, for every layer index
    and under jit with a traced index."""
    from v2pe_tpu.ops.quantized_matmul import (StackedQuantizedRef,
                                               quantized_dot_stacked)

    w = jax.random.normal(jax.random.PRNGKey(6), (4, 128, 200)) * 0.1
    qw = quantize_weight(w)  # stacked (4, 128, 256) int8, n_out=200
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 128), jnp.bfloat16)

    per_layer = jax.lax.scan(
        lambda _, lp: (None, quantized_dot(x, lp, jnp.float32)),
        None, qw)[1]

    @jax.jit
    def stacked(li):
        return quantized_dot_stacked(x, StackedQuantizedRef(qw, li),
                                     jnp.float32)

    for li in range(4):
        np.testing.assert_array_equal(np.asarray(stacked(jnp.int32(li))),
                                      np.asarray(per_layer[li]))


def test_split_stacked_quantized_roundtrip():
    from v2pe_tpu.ops.quantized_matmul import split_stacked_quantized

    layers = {"wqkv_kernel": quantize_weight(
                  jnp.ones((2, 16, 128), jnp.float32)),
              "attention_norm": jnp.ones((2, 16))}
    rest, quant = split_stacked_quantized(layers)
    assert set(rest) == {"attention_norm"}
    assert set(quant) == {"wqkv_kernel"}
    # unquantized dicts pass through untouched (no extra dict churn in
    # the training scan)
    plain = {"attention_norm": jnp.ones((2, 16))}
    rest2, quant2 = split_stacked_quantized(plain)
    assert rest2 is plain and quant2 is None


@pytest.fixture(scope="module")
def tiny_llm():
    cfg = LLMConfig(vocab_size=250, hidden_size=64, intermediate_size=96,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2)
    params = init_llm_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def test_llm_forward_quantized_close(tiny_llm):
    cfg, params = tiny_llm
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 250, size=(1, 24)))
    full, _ = internlm2.llm_forward(params, cfg, input_ids=ids,
                                    attn_impl="jnp")
    quant, _ = internlm2.llm_forward(quantize_llm_params(params), cfg,
                                     input_ids=ids, attn_impl="jnp")
    scale = float(jnp.max(jnp.abs(full)))
    assert float(jnp.max(jnp.abs(quant - full))) < 0.05 * max(scale, 1.0)
    agree = jnp.mean((jnp.argmax(quant, -1) == jnp.argmax(full, -1))
                     .astype(jnp.float32))
    assert float(agree) > 0.9


def test_quantize_idempotent(tiny_llm):
    _, params = tiny_llm
    q1 = quantize_llm_params(params)
    q2 = quantize_llm_params(q1)
    assert q2["layers"]["wqkv_kernel"] is q1["layers"]["wqkv_kernel"]
    assert isinstance(q2["output_kernel"], QuantizedWeight)


def _decode_tokens(params, cfg, cache_mode, **kw):
    gc = GenerationConfig(max_new_tokens=6, eos_token_ids=(249,))
    ids = jnp.asarray(
        np.random.RandomState(1).randint(0, 240, size=(2, 16)), jnp.int32)
    lens = jnp.asarray([16, 11], jnp.int32)
    pos = jnp.arange(16, dtype=jnp.float32)[None].repeat(2, 0)
    vcfg = VLMConfig(vision=VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=56, patch_size=14), llm=cfg)
    full = {"llm": params,
            "vision": init_vlm_params(jax.random.PRNGKey(9), vcfg)["vision"],
            "mlp1": init_vlm_params(jax.random.PRNGKey(9), vcfg)["mlp1"]}
    pix = jnp.zeros((1, 3, 56, 56), jnp.float32)
    flags = jnp.zeros((1,), jnp.int32)
    out, steps, lens_out = generate(
        full, vcfg, gc, ids, lens, pos, pix, flags, -1,
        attn_impl="jnp", cache_mode=cache_mode, page_size=8, **kw)
    return np.asarray(out), np.asarray(lens_out)


def test_generate_quantized_dense_paged_agree(tiny_llm):
    """Quantized decode must be self-consistent across cache layouts: the
    dense KV path and the paged-pool path see identical quantized weights,
    so their greedy streams must match token-exactly."""
    cfg, params = tiny_llm
    qp = quantize_llm_params(params)
    dense, lens_d = _decode_tokens(qp, cfg, "dense")
    paged, lens_p = _decode_tokens(qp, cfg, "paged")
    np.testing.assert_array_equal(dense, paged)
    np.testing.assert_array_equal(lens_d, lens_p)


def test_generate_quantized_int8_kv_compose(tiny_llm):
    """weights int8 + KV int8 compose (the min-HBM serving config)."""
    cfg, params = tiny_llm
    qp = quantize_llm_params(params)
    out, lens = _decode_tokens(qp, cfg, "paged", kv_dtype="int8")
    assert out.shape == (2, 6) and int(lens.min()) >= 1


@pytest.fixture(scope="module")
def chat_model_q():
    from .test_data_pipeline import _toy_tokenizer

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
    return (ChatModel(params, cfg, tok, attn_impl="jnp"),
            ChatModel(params, cfg, tok, attn_impl="jnp",
                      weights_dtype="int8"))


def test_chat_model_weights_dtype_knob(chat_model_q):
    full, quant = chat_model_q
    assert isinstance(quant.params["llm"]["output_kernel"], QuantizedWeight)
    # vision tower and embeddings untouched
    assert not isinstance(quant.params["llm"]["tok_embeddings"],
                          QuantizedWeight)
    txt = quant.chat(None, "Hello", GenerationConfig(max_new_tokens=4))
    assert isinstance(txt, str)


@pytest.mark.slow  # heavy decode-loop compile; session parity stays default via test_session.py, w8 numerics via the agree tests above
def test_session_quantized_matches_stateless(chat_model_q):
    """ChatSession over quantized weights == stateless quantized chat."""
    from v2pe_tpu.infer.session import ChatSession

    _, quant = chat_model_q
    gc = GenerationConfig(max_new_tokens=4)
    r1_ref, hist = quant.chat(None, "Describe.", gc, return_history=True)
    r2_ref = quant.chat(None, "More?", gc, history=hist)
    sess = ChatSession(quant, max_len=1024, page_size=8, chunk_multiple=64)
    assert sess.send(None, "Describe.", gc) == r1_ref
    assert sess.send(None, "More?", gc) == r2_ref


@pytest.mark.slow  # heavy batched-decode compile; w8 numerics stay default via the dense/paged/kv8 agree tests above, engine parity via test_engine.py defaults
def test_engine_quantized_matches_generate(chat_model_q):
    """The continuous-batching engine over int8 weights reproduces the
    one-shot quantized generate stream per request."""
    from v2pe_tpu.serve.engine import InferenceEngine

    _, quant = chat_model_q
    gc = GenerationConfig(max_new_tokens=5, eos_token_ids=(1,))
    eng = InferenceEngine(quant, max_rows=2, max_len=128, page_size=8,
                          chunk_size=16, decode_block=4,
                          generation_config=gc)
    rng = np.random.RandomState(3)
    prompts = [rng.randint(4, 200, size=s) for s in (21, 13, 9)]
    reqs = [eng.submit(p, np.arange(len(p), dtype=np.float32),
                       max_new_tokens=5) for p in prompts]
    eng.run_until_idle()
    for p, r in zip(prompts, reqs):
        ids = jnp.asarray(p, jnp.int32)[None]
        out, _, lens = generate(
            quant.params, quant.cfg, gc, ids,
            jnp.asarray([len(p)], jnp.int32),
            jnp.arange(len(p), dtype=jnp.float32)[None],
            jnp.zeros((1, 3, 56, 56), jnp.float32),
            jnp.zeros((1,), jnp.int32), -1, attn_impl="jnp",
            cache_mode="paged", page_size=8)
        expect = list(np.asarray(out[0][:int(lens[0])]))
        assert r.tokens == expect, (r.tokens, expect)


def test_quantized_param_sharding_specs():
    """param_sharding maps QuantizedWeight children: q like the kernel it
    replaces, scale on the output dim only."""
    from jax.sharding import Mesh
    from v2pe_tpu.parallel.mesh import param_sharding

    devs = np.array(jax.devices()[:8]).reshape(1, 2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "seq", "tensor"))
    cfg = LLMConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2)
    qp = {"llm": quantize_llm_params(
        init_llm_params(jax.random.PRNGKey(0), cfg))}
    shardings = param_sharding(qp, mesh)
    wq = shardings["llm"]["layers"]["wqkv_kernel"]
    assert wq.q.spec == jax.sharding.PartitionSpec(None, "fsdp", "tensor")
    assert wq.scale.spec[-1] == "tensor"
    head = shardings["llm"]["output_kernel"]
    assert head.q.spec == jax.sharding.PartitionSpec("fsdp", "tensor")


# ---------------------------------------------------------------------------
# int4 (group-128 symmetric, nibble-packed) — the 4x weight-bandwidth tier
# ---------------------------------------------------------------------------

def test_int4_roundtrip_error_bound():
    """Dequant error per element is bounded by half the group step size
    (f32 reconstruction; the serving-path ``_dequant_int4_jnp`` additionally
    rounds to bf16)."""
    from v2pe_tpu.ops.quantized_matmul import (_unpack_nibbles,
                                               quantize_weight_int4)

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 192)) * 0.1
    qw = quantize_weight_int4(w, group_size=64)
    assert qw.group_size == 64 and qw.p.shape == (128, 256)  # lane-padded
    lo, hi = _unpack_nibbles(qw.p)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    deq = (q.reshape(4, 64, -1) * qw.scale[:, None, :]).reshape(256, -1)
    step = jnp.repeat(qw.scale[:, :qw.n_out], 64, axis=0)
    assert float(jnp.max(jnp.abs(deq[:, :qw.n_out] - w) / step)) \
        <= 0.5 + 1e-6


def test_int4_group_size_adapts_to_small_dims():
    from v2pe_tpu.ops.quantized_matmul import quantize_weight_int4

    qw = quantize_weight_int4(jnp.ones((64, 128)), group_size=128)
    assert qw.group_size == 32  # gcd(128, 64/2)
    with pytest.raises(ValueError):
        quantize_weight_int4(jnp.ones((63, 128)))


def test_int4_odd_width_padded_and_sliced():
    from v2pe_tpu.ops.quantized_matmul import quantize_weight_int4

    w = jax.random.normal(jax.random.PRNGKey(1), (256, 93)) * 0.05
    qw = quantize_weight_int4(w)
    assert qw.p.shape == (128, 128) and qw.n_out == 93
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 256), jnp.bfloat16)
    out = quantized_dot(x, qw)
    assert out.shape == (5, 93)
    ref = jnp.dot(x.astype(jnp.float32), w)
    # int4 group noise ~ step/2 * sqrt(D): a loose sanity bound only —
    # kernel-exactness vs the dequant reference is the test below
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.8


def test_int4_kernel_matches_jnp_fallback():
    """Interpret-mode Pallas int4 == the sharded-path jnp dequant dot."""
    from v2pe_tpu.ops.quantized_matmul import (_dequant_int4_jnp,
                                               quantize_weight_int4)

    w = jax.random.normal(jax.random.PRNGKey(3), (512, 384)) * 0.2
    qw = quantize_weight_int4(w)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 512), jnp.bfloat16)
    # compare f32 accumulators: the kernel sums two half-depth dots, so
    # the accumulation order differs from the single jnp dot by ~1 ulp
    out_kernel = quantized_dot(x, qw, jnp.float32)
    deq = jnp.dot(x.reshape(-1, 512).astype(jnp.bfloat16),
                  _dequant_int4_jnp(qw),
                  preferred_element_type=jnp.float32)
    out_jnp = deq[:, :qw.n_out].reshape(2, 9, -1)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_jnp),
                               rtol=1e-4, atol=1e-4)


def test_int4_stacked_kernel_matches_per_layer_dot():
    from v2pe_tpu.ops.quantized_matmul import (Int4Weight,
                                               StackedQuantizedRef,
                                               quantize_weight_int4,
                                               quantized_dot_stacked)

    w = jax.random.normal(jax.random.PRNGKey(6), (4, 256, 200)) * 0.1
    qw = quantize_weight_int4(w)
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 256), jnp.bfloat16)

    @jax.jit
    def stacked(li):
        return quantized_dot_stacked(x, StackedQuantizedRef(qw, li),
                                     jnp.float32)

    for li in range(4):
        per_layer = quantized_dot(
            x, Int4Weight(qw.p[li], qw.scale[li], qw.n_out, qw.group_size),
            jnp.float32)
        np.testing.assert_array_equal(np.asarray(stacked(jnp.int32(li))),
                                      np.asarray(per_layer))


def test_llm_forward_int4_close(tiny_llm):
    cfg, params = tiny_llm
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 250, size=(1, 24)))
    full, _ = internlm2.llm_forward(params, cfg, input_ids=ids,
                                    attn_impl="jnp")
    quant, _ = internlm2.llm_forward(quantize_llm_params(params, bits=4),
                                     cfg, input_ids=ids, attn_impl="jnp")
    scale = float(jnp.max(jnp.abs(full)))
    assert float(jnp.max(jnp.abs(quant - full))) < 0.15 * max(scale, 1.0)
    agree = jnp.mean((jnp.argmax(quant, -1) == jnp.argmax(full, -1))
                     .astype(jnp.float32))
    assert float(agree) > 0.75


def test_int4_generate_dense_paged_agree(tiny_llm):
    cfg, params = tiny_llm
    qp = quantize_llm_params(params, bits=4)
    dense, lens_d = _decode_tokens(qp, cfg, "dense")
    paged, lens_p = _decode_tokens(qp, cfg, "paged")
    np.testing.assert_array_equal(dense, paged)
    np.testing.assert_array_equal(lens_d, lens_p)


def test_quantize_idempotent_mixed_bits(tiny_llm):
    """bits=4 over an int8-quantized dict leaves the int8 leaves alone
    (already-quantized weights never re-quantize)."""
    from v2pe_tpu.ops.quantized_matmul import Int4Weight

    _, params = tiny_llm
    q8 = quantize_llm_params(params)
    q4_over_q8 = quantize_llm_params(q8, bits=4)
    assert q4_over_q8["layers"]["wqkv_kernel"] is q8["layers"]["wqkv_kernel"]
    q4 = quantize_llm_params(params, bits=4)
    assert isinstance(q4["output_kernel"], Int4Weight)
    assert quantize_llm_params(q4, bits=4)["output_kernel"] \
        is q4["output_kernel"]


def test_chat_model_int4_knob(chat_model_q):
    from v2pe_tpu.ops.quantized_matmul import Int4Weight

    full, _ = chat_model_q
    quant4 = ChatModel(full.params, full.cfg, full.tokenizer,
                       attn_impl="jnp", weights_dtype="int4")
    assert isinstance(quant4.params["llm"]["output_kernel"], Int4Weight)
    txt = quant4.chat(None, "Hello", GenerationConfig(max_new_tokens=4))
    assert isinstance(txt, str)


def test_int4_param_sharding_specs():
    """Int4Weight children map like the kernel they replace (p on the
    kernel spec, group scales on the output dim only)."""
    from jax.sharding import Mesh
    from v2pe_tpu.ops.quantized_matmul import Int4Weight  # noqa: F401
    from v2pe_tpu.parallel.mesh import param_sharding

    devs = np.array(jax.devices()[:8]).reshape(1, 2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "seq", "tensor"))
    cfg = LLMConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2)
    qp = {"llm": quantize_llm_params(
        init_llm_params(jax.random.PRNGKey(0), cfg), bits=4)}
    shardings = param_sharding(qp, mesh)
    wq = shardings["llm"]["layers"]["wqkv_kernel"]
    assert wq.p.spec == jax.sharding.PartitionSpec(None, "fsdp", "tensor")
    assert wq.scale.spec[-1] == "tensor"
    head = shardings["llm"]["output_kernel"]
    assert head.p.spec == jax.sharding.PartitionSpec("fsdp", "tensor")


def test_engine_quantized_seq_sharded_token_exact(chat_model_q):
    """int8 weights under the seq-sharded mesh (jnp dequant fallback) ==
    unsharded int8 streams."""
    from jax.sharding import Mesh
    from v2pe_tpu.parallel import context as pctx
    from v2pe_tpu.serve.engine import InferenceEngine

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _, quant = chat_model_q
    gc = GenerationConfig(max_new_tokens=4, eos_token_ids=(1,))
    rng = np.random.RandomState(5)
    prompts = [rng.randint(4, 200, size=s) for s in (19, 7)]

    def run(ctx):
        with pctx.use_sharding(ctx):
            eng = InferenceEngine(quant, max_rows=2, max_len=64,
                                  page_size=4, chunk_size=16,
                                  decode_block=4, generation_config=gc)
            reqs = [eng.submit(p, np.arange(len(p), dtype=np.float32),
                               max_new_tokens=4) for p in prompts]
            eng.run_until_idle()
        return [r.tokens for r in reqs]

    ref = run(None)
    devs = np.array(jax.devices()[:8]).reshape(1, 2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "seq", "tensor"))
    got = run(pctx.ShardingContext(mesh=mesh))
    assert got == ref
