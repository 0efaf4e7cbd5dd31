"""Stage-by-stage parity debugging between torch reference and flax model."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import importlib.util
import types

import numpy as np
import torch

import jax
import jax.numpy as jnp

spec = importlib.util.spec_from_file_location(
    "ref_model", "/root/reference/toolkit/models/wengnet_mosei_mult_views_text_missing.py"
)
ref_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_mod)

from sdumc_tpu.convert import torch_state_dict_to_params
from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.models.fusion import SDUMCFusion

INPUT_DIMS = (48, 96, 48)
args = types.SimpleNamespace(input_dims=list(INPUT_DIMS))
torch.manual_seed(0)
tm = ref_mod.WengnetMOSEIMultViewsTextMissing(args)
tm.eval()

cfg = ModelConfig(input_dims=INPUT_DIMS)
jm = SDUMCFusion(cfg)
dummy = tuple(jnp.zeros((2, 4, d)) for d in INPUT_DIMS)
template = jm.init(jax.random.PRNGKey(0), *dummy)["params"]
params, report = torch_state_dict_to_params(tm.state_dict(), template)
print("report", {k: len(v) for k, v in report.items()})

rng = np.random.default_rng(1)
b, ta_, tt_, tv_ = 3, 7, 5, 6
a = rng.normal(size=(b, ta_, INPUT_DIMS[0])).astype(np.float32)
t = rng.normal(size=(b, tt_, INPUT_DIMS[1])).astype(np.float32)
v = rng.normal(size=(b, tv_, INPUT_DIMS[2])).astype(np.float32)

ta_t, tt_t, tv_t = torch.tensor(a), torch.tensor(t), torch.tensor(v)

with torch.no_grad():
    af = tm.frame_dim_reshape_0(ta_t)
    tf = tm.frame_dim_reshape_1(tt_t)
    vf = tm.frame_dim_reshape_2(tv_t)
    ah_pre, at0 = tm.fra2utt_0(af)
    th_pre, at1 = tm.fra2utt_1(tf)
    vh_pre, at2 = tm.fra2utt_2(vf)
    ah = tm.audio_mlp(ah_pre); th = tm.text_mlp(th_pre); vh = tm.video_mlp(vh_pre)
    mh1 = torch.cat([ah, th, vh], dim=1)
    att = tm.fc_att(tm.attention_mlp(mh1)).unsqueeze(2)
    mh2 = torch.stack([ah, th, vh], dim=2)
    fused = torch.matmul(mh2, att).squeeze()
    fused_at = torch.matmul(mh2[:, :, :2], att[:, :2, :]).squeeze()
    fused_tv = torch.matmul(mh2[:, :, 1:], att[:, 1:, :]).squeeze()
    mh2av = torch.stack((mh2[:, :, 0], mh2[:, :, 2]), dim=2)
    attav = torch.stack((att[:, 0, :], att[:, 2, :]), dim=1)
    fused_av = torch.matmul(mh2av, attav).squeeze()
    fq = tm.cross_fused_query_mlp(fused)
    atq = tm.cross_at_query_mlp(fused_at)
    tvq = tm.cross_tv_query_mlp(fused_tv)
    avq = tm.cross_av_query_mlp(fused_av)
    aq = tm.cross_audio_query_mlp(ah)
    tq = tm.cross_text_query_mlp(th)
    vq = tm.cross_video_query_mlp(vh)
    mq = torch.stack([fq, atq, tvq, avq, aq, tq, vq], dim=1)
    ca, _ = tm.cross_att_fra2utt_0(mq, af)
    ct, _ = tm.cross_att_fra2utt_1(mq, tf)
    cv, _ = tm.cross_att_fra2utt_2(mq, vf)
    ca = tm.cross_audio_mlp(ca); ct = tm.cross_text_mlp(ct); cv = tm.cross_video_mlp(cv)
    ch = torch.stack([ca, ct, cv], dim=1)
    wch = (att.unsqueeze(3) * ch).sum(dim=1)
    cmh1 = wch.view(wch.shape[0], -1)
    catt = tm.cross_fc_att(tm.cross_attention_mlp(cmh1)).unsqueeze(2)
    cff = torch.matmul(wch.transpose(1, 2), catt).squeeze()
    vals = tm.fc_out_v(cff)

torch_stages = dict(af=af, ah_pre=ah_pre, ah=ah, att=att.squeeze(-1), fused=fused,
                    fused_av=fused_av, mq=mq, ca_raw=None, ca=ca, wch=wch, cff=cff, vals=vals)

# flax intermediates via capture
_, aux = jm.apply({"params": params}, jnp.array(a), jnp.array(t), jnp.array(v))
vals_j, aux = jm.apply({"params": params}, jnp.array(a), jnp.array(t), jnp.array(v))

def cmp(name, tt_, jj_):
    tt_ = tt_.numpy() if hasattr(tt_, "numpy") else np.asarray(tt_)
    jj_ = np.asarray(jj_)
    ok = np.allclose(tt_, jj_, rtol=1e-4, atol=1e-5)
    print(f"{name:12s} ok={ok} maxdiff={np.max(np.abs(tt_ - jj_)):.3e}")

cmp("vals", vals, vals_j)

# now step-by-step on the jax side, replicating fusion.py manually
p = params
def dense(x, mod):
    k = p[mod]["dense"]["kernel"]; bb = p[mod]["dense"]["bias"]
    return x @ k + bb

af_j = dense(jnp.array(a), "frame_dim_reshape_0")
cmp("af", af, af_j)

def fra(x, mod):
    pp = p[mod]
    proj = jnp.tanh(x @ pp["input_proj"]["dense"]["kernel"] + pp["input_proj"]["dense"]["bias"])
    scores = jnp.einsum("btd,d->bt", proj, pp["context"][0])
    attn = jax.nn.softmax(0.3 * scores, axis=1)
    return jnp.einsum("btd,bt->bd", x, attn)

ah_pre_j = fra(af_j, "fra2utt_0")
cmp("ah_pre", ah_pre, ah_pre_j)

def mlp(x, mod, n):
    for i in range(n):
        x = jax.nn.relu(x @ p[mod][f"linear_{i}"]["dense"]["kernel"] + p[mod][f"linear_{i}"]["dense"]["bias"])
    return x

ah_j = mlp(ah_pre_j, "audio_mlp", 2)
cmp("ah", ah, ah_j)

tf_j = dense(jnp.array(t), "frame_dim_reshape_1")
vf_j = dense(jnp.array(v), "frame_dim_reshape_2")
th_j = mlp(fra(tf_j, "fra2utt_1"), "text_mlp", 2)
vh_j = mlp(fra(vf_j, "fra2utt_2"), "video_mlp", 2)
mh1_j = jnp.concatenate([ah_j, th_j, vh_j], axis=1)
att_j = dense(mlp(mh1_j, "attention_mlp", 2), "fc_att")
cmp("att", att.squeeze(-1), att_j)

hid = jnp.stack([ah_j, th_j, vh_j], axis=1)
fused_j = jnp.einsum("bmd,bm->bd", hid, att_j)
cmp("fused", fused, fused_j)
fused_av_j = jnp.einsum("bmd,bm->bd", hid[:, jnp.array([0, 2])], att_j[:, jnp.array([0, 2])])
cmp("fused_av", fused_av, fused_av_j)

fq_j = mlp(fused_j, "cross_fused_query_mlp", 1)
atq_j = mlp(jnp.einsum("bmd,bm->bd", hid[:, :2], att_j[:, :2]), "cross_at_query_mlp", 1)
tvq_j = mlp(jnp.einsum("bmd,bm->bd", hid[:, 1:], att_j[:, 1:]), "cross_tv_query_mlp", 1)
avq_j = mlp(fused_av_j, "cross_av_query_mlp", 1)
aq_j = mlp(ah_j, "cross_audio_query_mlp", 1)
tq_j = mlp(th_j, "cross_text_query_mlp", 1)
vq_j = mlp(vh_j, "cross_video_query_mlp", 1)
mq_j = jnp.stack([fq_j, atq_j, tvq_j, avq_j, aq_j, tq_j, vq_j], axis=1)
cmp("mq", mq, mq_j)

def xatt(q, x, mod):
    pp = p[mod]
    qq = q @ pp["query_proj"]["dense"]["kernel"] + pp["query_proj"]["dense"]["bias"]
    kk = jnp.tanh(x @ pp["input_proj"]["dense"]["kernel"] + pp["input_proj"]["dense"]["bias"])
    sc = jnp.einsum("btd,bqd->btq", kk, qq)
    attn = jax.nn.softmax(0.3 * sc, axis=1)
    return jnp.einsum("btd,btq->bqd", x, attn)

ca_j = mlp(xatt(mq_j, af_j, "cross_att_fra2utt_0"), "cross_audio_mlp", 2)
cmp("ca", ca, ca_j)
ct_j = mlp(xatt(mq_j, tf_j, "cross_att_fra2utt_1"), "cross_text_mlp", 2)
cv_j = mlp(xatt(mq_j, vf_j, "cross_att_fra2utt_2"), "cross_video_mlp", 2)
ch_j = jnp.stack([ca_j, ct_j, cv_j], axis=1)
wch_j = jnp.einsum("bmqh,bm->bqh", ch_j, att_j)
cmp("wch", wch, wch_j)
cff_j = jnp.einsum("bqh,bq->bh", wch_j, dense(mlp(wch_j.reshape(wch_j.shape[0], -1), "cross_attention_mlp", 2), "cross_fc_att"))
cmp("cff", cff, cff_j)
vals_jj = dense(cff_j, "fc_out_v")
cmp("vals2", vals, vals_jj)
