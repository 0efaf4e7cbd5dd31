"""Non-LLaMA text-encoder family parity vs HF transformers on tiny random
configs (extract_text_embedding_huggingface.py:139-282 drives bert/roberta/
bloom through the same hidden-state path as the LLMs)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert.hf_bert import config_from_hf as bert_cfg_from_hf
from sdumc_tpu.convert.hf_bert import hf_bert_to_params
from sdumc_tpu.convert.hf_bloom import config_from_hf as bloom_cfg_from_hf
from sdumc_tpu.convert.hf_bloom import hf_bloom_to_params
from sdumc_tpu.models.bert import BertModel
from sdumc_tpu.models.bloom import BloomModel


def _assert_hidden_parity(got, ref_hidden, layer_ids=(-4, -3, -2, -1),
                          rtol=1e-4, atol=1e-5):
    hs = got["hidden_states"]
    for i in range(len(hs)):
        np.testing.assert_allclose(
            np.asarray(hs[i]), ref_hidden[i].numpy(), rtol=rtol, atol=atol,
            err_msg=f"hidden state {i}",
        )


def test_bert_parity():
    from transformers import BertConfig as HFCfg
    from transformers import BertModel as HFModel

    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = bert_cfg_from_hf(hf_cfg)
    assert cfg.position_offset == 0
    params = hf_bert_to_params(hf.state_dict())
    model = BertModel(cfg)

    ids = np.array([[2, 7, 8, 9, 3, 0, 0], [2, 11, 12, 3, 0, 0, 0]])
    mask = ids != 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 output_hidden_states=True)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      pad_mask=jnp.asarray(mask), output_hidden_states=True)
    # compare only valid rows: HF attends pad queries too but downstream
    # slices the meaningful span
    m = mask[:, :, None]
    for i, ref_h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.where(m, np.asarray(got["hidden_states"][i]), 0.0),
            np.where(m, ref_h.numpy(), 0.0), rtol=1e-4, atol=1e-5,
            err_msg=f"hidden {i}",
        )


def test_roberta_parity_with_position_offset():
    from transformers import RobertaConfig as HFCfg
    from transformers import RobertaModel as HFModel

    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, pad_token_id=1,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = HFModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = bert_cfg_from_hf(hf_cfg)
    assert cfg.position_offset == 2
    params = hf_bert_to_params(hf.state_dict())
    model = BertModel(cfg)

    ids = np.array([[0, 7, 8, 9, 2]])  # no padding: offsets line up exactly
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), output_hidden_states=True)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      output_hidden_states=True)
    _assert_hidden_parity(got, ref.hidden_states)


def test_bloom_parity():
    from transformers import BloomConfig as HFCfg
    from transformers import BloomModel as HFModel

    hf_cfg = HFCfg(
        vocab_size=96, hidden_size=32, n_layer=2, n_head=4,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    hf = HFModel(hf_cfg).eval()
    cfg = bloom_cfg_from_hf(hf_cfg)
    params = hf_bloom_to_params(hf.state_dict())
    model = BloomModel(cfg)

    ids = np.array([[5, 7, 8, 9, 11, 13], [6, 7, 9, 2, 2, 2]])
    mask = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]], bool)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 output_hidden_states=True)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      pad_mask=jnp.asarray(mask), output_hidden_states=True)
    m = mask[:, :, None]
    for i, ref_h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.where(m, np.asarray(got["hidden_states"][i]), 0.0),
            np.where(m, ref_h.numpy(), 0.0), rtol=1e-4, atol=1e-5,
            err_msg=f"hidden {i}",
        )


def test_alibi_slopes_non_power_of_two():
    from sdumc_tpu.models.bloom import alibi_slopes

    s = np.asarray(alibi_slopes(6))
    assert s.shape == (6,)
    assert np.all(s[1:4] < s[0:3])  # decreasing within the base group


def test_bert_batched_extraction_and_empty_sentences():
    """extract_text_features drives bidirectional encoders through the same
    bucketed batching; empty transcripts yield the reference's zeros
    placeholder (extract_text_embedding_huggingface.py:245,258-276)."""
    from sdumc_tpu.extract.text import extract_text_features
    from sdumc_tpu.models.bert import BertConfig, BertModel
    from tests.test_extract import InvertibleTok

    cfg = BertConfig.tiny(vocab_size=120)
    model = BertModel(cfg)
    tok = InvertibleTok()
    sentences = ["a b c", "", "d e f g h i j", "k", None]
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray([[1, 2, 3]]))["params"]

    got = extract_text_features(
        model, params, tok, sentences,
        layer_ids=(-2, -1), buckets=(4, 8), batch_size=2,
    )

    assert got[1].shape == (1, cfg.hidden_size) and not got[1].any()
    assert got[4].shape == (1, cfg.hidden_size) and not got[4].any()
    for idx in (0, 2, 3):
        ids = tok(sentences[idx])["input_ids"]
        out = model.apply({"params": params}, jnp.asarray([ids]),
                          output_hidden_states=True)
        hs = out["hidden_states"]
        ref = (np.asarray(hs[-2]) + np.asarray(hs[-1]))[0, 1:]
        np.testing.assert_allclose(got[idx], ref, rtol=2e-5, atol=2e-5)


def test_albert_parity():
    from transformers import AlbertConfig as HFCfg
    from transformers import AlbertModel as HFModel

    from sdumc_tpu.convert.hf_albert import config_from_hf, hf_albert_to_params
    from sdumc_tpu.models.albert import AlbertModel

    hf_cfg = HFCfg(
        vocab_size=99, embedding_size=16, hidden_size=32,
        num_hidden_layers=3, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(3)
    hf = HFModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    params = hf_albert_to_params(hf.state_dict())
    model = AlbertModel(cfg)

    ids = np.array([[2, 7, 8, 9, 3], [2, 11, 12, 3, 0]])
    mask = ids != 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 output_hidden_states=True)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      pad_mask=jnp.asarray(mask), output_hidden_states=True)
    m = mask[:, :, None]
    for i, ref_h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.where(m, np.asarray(got["hidden_states"][i]), 0.0),
            np.where(m, ref_h.numpy(), 0.0), rtol=1e-4, atol=1e-5,
            err_msg=f"hidden {i}",
        )
    # shared params: exactly one layer's worth regardless of depth
    import jax as _jax

    layer_leaves = _jax.tree_util.tree_leaves(params["layer"])
    assert len(layer_leaves) == 16


@pytest.mark.parametrize("biased_input,type_vocab", [(False, 0), (True, 2)])
def test_deberta_parity(biased_input, type_vocab):
    """Disentangled attention (c2c + c2p + p2c with the shared rel-pos
    table) vs HF DebertaModel — both the released layout
    (position_biased_input=False) and the biased-input variant."""
    from transformers import DebertaConfig as HFCfg
    from transformers import DebertaModel as HFModel

    from sdumc_tpu.convert.hf_deberta import config_from_hf, hf_deberta_to_params
    from sdumc_tpu.models.deberta import DebertaModel

    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, relative_attention=True,
        max_relative_positions=8, position_biased_input=biased_input,
        pos_att_type=["c2p", "p2c"],
        type_vocab_size=type_vocab, attn_implementation="eager",
    )
    torch.manual_seed(4)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.max_relative_positions == 8
    assert cfg.pos_att_type == ("c2p", "p2c")
    params = hf_deberta_to_params(hf.state_dict())
    model = DebertaModel(cfg)

    ids = np.array([[2, 7, 8, 9, 3, 14, 15, 16, 17, 18, 19, 20],
                    [2, 11, 12, 3, 0, 0, 0, 0, 0, 0, 0, 0]])
    mask = ids != 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 output_hidden_states=True)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      pad_mask=jnp.asarray(mask), output_hidden_states=True)
    m = mask[:, :, None]
    for i, ref_h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.where(m, np.asarray(got["hidden_states"][i]), 0.0),
            np.where(m, ref_h.numpy(), 0.0), rtol=2e-4, atol=2e-5,
            err_msg=f"hidden {i}",
        )

def test_glm_parity():
    """HF-native GlmModel is the chatglm2/glm-4 architecture (partial
    interleaved rotary, GQA w/ QKV bias, fused gate_up SwiGLU)."""
    from transformers import GlmConfig as HFCfg
    from transformers import GlmModel as HFModel

    from sdumc_tpu.convert.hf_glm import config_from_hf, hf_glm_to_params
    from sdumc_tpu.models.glm import GlmModel

    hf_cfg = HFCfg(
        vocab_size=97, hidden_size=48, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, partial_rotary_factor=0.5, pad_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.rotary_dim == 6
    params = hf_glm_to_params(hf.state_dict(), cfg)
    model = GlmModel(cfg)

    ids = np.array([[5, 7, 8, 9, 11, 13], [6, 7, 9, 2, 2, 2]])
    mask = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]], bool)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 output_hidden_states=True)
    got = model.apply({"params": params}, jnp.asarray(ids),
                      pad_mask=jnp.asarray(mask), output_hidden_states=True)
    m = mask[:, :, None]
    for i, ref_h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.where(m, np.asarray(got["hidden_states"][i]), 0.0),
            np.where(m, ref_h.numpy(), 0.0), rtol=1e-4, atol=1e-5,
            err_msg=f"hidden {i}",
        )


def test_chatglm2_statedict_mapping():
    """A THUDM-layout chatglm2 state dict (fused query_key_value /
    dense_h_to_4h) converts to the same params as the equivalent HF-native
    layout — verified by building the chatglm2 dict FROM a random HF Glm
    model and asserting identical outputs."""
    from transformers import GlmConfig as HFCfg
    from transformers import GlmModel as HFModel

    from sdumc_tpu.convert.hf_glm import config_from_hf, hf_glm_to_params
    from sdumc_tpu.models.glm import GlmModel

    hf_cfg = HFCfg(
        vocab_size=97, hidden_size=48, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, pad_token_id=0, attn_implementation="eager",
    )
    torch.manual_seed(4)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    sd = {k: v for k, v in hf.state_dict().items()}

    chatglm = {"transformer.embedding.word_embeddings.weight":
               sd["embed_tokens.weight"],
               "transformer.encoder.final_layernorm.weight": sd["norm.weight"],
               "transformer.output_layer.weight": sd["embed_tokens.weight"]}
    for i in range(hf_cfg.num_hidden_layers):
        src = f"layers.{i}."
        dst = f"transformer.encoder.layers.{i}."
        for kind in ("weight", "bias"):
            chatglm[dst + f"self_attention.query_key_value.{kind}"] = (
                torch.cat([sd[src + f"self_attn.q_proj.{kind}"],
                           sd[src + f"self_attn.k_proj.{kind}"],
                           sd[src + f"self_attn.v_proj.{kind}"]], dim=0))
        chatglm[dst + "self_attention.dense.weight"] = (
            sd[src + "self_attn.o_proj.weight"])
        chatglm[dst + "mlp.dense_h_to_4h.weight"] = (
            sd[src + "mlp.gate_up_proj.weight"])
        chatglm[dst + "mlp.dense_4h_to_h.weight"] = (
            sd[src + "mlp.down_proj.weight"])
        chatglm[dst + "input_layernorm.weight"] = (
            sd[src + "input_layernorm.weight"])
        chatglm[dst + "post_attention_layernorm.weight"] = (
            sd[src + "post_attention_layernorm.weight"])

    p_hf = hf_glm_to_params(sd, cfg)
    p_cg = hf_glm_to_params(chatglm, cfg)
    model = GlmModel(cfg)
    ids = jnp.asarray(np.array([[5, 7, 8, 9, 11]]))
    out_hf = model.apply({"params": p_hf}, ids)["last_hidden_state"]
    out_cg = model.apply({"params": p_cg}, ids)["last_hidden_state"]
    np.testing.assert_array_equal(np.asarray(out_hf), np.asarray(out_cg))


def test_chatglm2_raw_checkpoint_loader(tmp_path):
    """load_hf_glm must take the trust_remote_code-free branch for a THUDM
    chatglm2 checkpoint dir (model_type 'chatglm'): GlmConfig built from
    the chatglm config fields (multi_query_group_num -> num_kv_heads,
    ffn_hidden_size, kv_channels, rope_ratio), tensors read raw from
    pytorch_model.bin — GlmModel.from_pretrained would reject this layout."""
    import json

    from sdumc_tpu.convert.hf_glm import load_hf_glm
    from sdumc_tpu.models.glm import GlmModel

    H, NH, KV, HD, FFN, L, V = 48, 4, 2, 12, 80, 2, 97
    raw_cfg = {
        "model_type": "chatglm", "hidden_size": H, "ffn_hidden_size": FFN,
        "num_layers": L, "num_attention_heads": NH, "kv_channels": HD,
        "multi_query_attention": True, "multi_query_group_num": KV,
        "padded_vocab_size": V, "layernorm_epsilon": 1e-5,
        "add_qkv_bias": True, "rope_ratio": 1.0,
    }
    torch.manual_seed(5)
    q_sz, kv_sz = NH * HD, KV * HD
    sd = {
        "transformer.embedding.word_embeddings.weight": torch.randn(V, H),
        "transformer.encoder.final_layernorm.weight": torch.randn(H),
        "transformer.output_layer.weight": torch.randn(V, H),
        "transformer.rotary_pos_emb.inv_freq": torch.randn(HD // 4),
    }
    for i in range(L):
        pre = f"transformer.encoder.layers.{i}."
        sd[pre + "self_attention.query_key_value.weight"] = torch.randn(
            q_sz + 2 * kv_sz, H)
        sd[pre + "self_attention.query_key_value.bias"] = torch.randn(
            q_sz + 2 * kv_sz)
        sd[pre + "self_attention.dense.weight"] = torch.randn(H, q_sz)
        sd[pre + "mlp.dense_h_to_4h.weight"] = torch.randn(2 * FFN, H)
        sd[pre + "mlp.dense_4h_to_h.weight"] = torch.randn(H, FFN)
        sd[pre + "input_layernorm.weight"] = torch.randn(H)
        sd[pre + "post_attention_layernorm.weight"] = torch.randn(H)

    d = tmp_path / "chatglm2-6b"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(raw_cfg))
    torch.save(sd, str(d / "pytorch_model.bin"))

    cfg, params = load_hf_glm(str(d))
    assert (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads) == (H, NH, KV)
    assert cfg.head_dim == HD and cfg.intermediate_size == FFN
    assert cfg.vocab_size == V and cfg.num_layers == L
    assert params["layers_0"]["self_attn"]["q_proj"]["kernel"].shape == (H, q_sz)
    assert params["layers_0"]["self_attn"]["k_proj"]["kernel"].shape == (H, kv_sz)
    assert "bias" in params["layers_0"]["self_attn"]["q_proj"]

    model = GlmModel(cfg)
    ids = jnp.asarray(np.array([[3, 1, 4, 1, 5]]))
    out = model.apply({"params": params}, ids)["last_hidden_state"]
    assert np.isfinite(np.asarray(out)).all()
