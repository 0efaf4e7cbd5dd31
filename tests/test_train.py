"""Train-step tests: optimizer parity vs torch Adam, schedule parity vs
torch LambdaLR, and loss-decrease smoke on synthetic data."""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert import torch_state_dict_to_params
from sdumc_tpu.core.config import DataConfig, ExperimentConfig, LossConfig, ModelConfig, PathsConfig, TrainConfig
from sdumc_tpu.models.fusion import SDUMCFusion
from sdumc_tpu.train.schedule import make_lr_schedule, warmup_step_decay_factor
from sdumc_tpu.train.state import create_train_state
from sdumc_tpu.train.step import dual_view_loss, make_eval_step, make_train_step

INPUT_DIMS = (24, 48, 24)


def test_schedule_matches_torch_lambdalr():
    base_lr = 1e-4
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(lin.parameters(), lr=base_lr)
    gamma, stepsize, warm = 0.9, 10, 5
    fn = lambda epoch: (epoch + 1) / warm if epoch < warm else gamma ** ((epoch + 1 - warm) // stepsize)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=fn)
    torch_lrs = []
    for _ in range(40):
        torch_lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    ours = [base_lr * float(warmup_step_decay_factor(e)) for e in range(40)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-6)

    # per-step schedule floors to epochs
    s = make_lr_schedule(base_lr, steps_per_epoch=7)
    assert float(s(0)) == float(s(6))
    assert np.isclose(float(s(0)), torch_lrs[0], rtol=1e-6)
    assert np.isclose(float(s(7)), torch_lrs[1], rtol=1e-6)


def _adam_batch():
    rng = np.random.default_rng(0)
    B, TA, TT, TV, TF = 6, 7, 5, 6, 4
    return {
        "a": rng.normal(size=(B, TA, INPUT_DIMS[0])).astype(np.float32),
        "t": rng.normal(size=(B, TT, INPUT_DIMS[1])).astype(np.float32),
        "v": rng.normal(size=(B, TV, INPUT_DIMS[2])).astype(np.float32),
        "f4": rng.normal(size=(B, TF, INPUT_DIMS[1])).astype(np.float32),
        "vals": rng.uniform(-3, 3, size=(B,)).astype(np.float32),
        "tmax": (TA, TT, TV, TF),
    }

_ADAM_CHECKS = {
    ("frame_dim_reshape_0", "dense", "kernel"): ("frame_dim_reshape_0.weight", True),
    ("fc_out_v", "dense", "bias"): ("fc_out_v.bias", False),
    ("fra2utt_1", "context"): ("fra2utt_1.attention_context_vector", False),
    ("cross_att_fra2utt_0", "query_proj", "dense", "kernel"):
        ("cross_att_fra2utt_0.query_proj.weight", True),
    ("orgin_linear_change_1", "dense", "kernel"): ("orgin_linear_change.2.weight", True),
}


def _adam_golden():
    """Torch side of the Adam parity test: one optimizer step with the
    reference loss recipe (main:148), frozen to goldens."""
    from tests.conftest import load_reference_module

    ref_losses = load_reference_module("toolkit/utils/loss.py", "ref_loss")
    ref_model_module = load_reference_module(
        "toolkit/models/wengnet_mosei_mult_views_text_missing.py", "ref_model")
    args = types.SimpleNamespace(input_dims=list(INPUT_DIMS))
    torch.manual_seed(3)
    tmodel = ref_model_module.WengnetMOSEIMultViewsTextMissing(args)
    tmodel.eval()  # dropout off; grads still flow
    loss_cfg = LossConfig()
    d = _adam_batch()

    init_sd = {k: v.detach().numpy().copy()
               for k, v in tmodel.state_dict().items()}

    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-4, weight_decay=1e-5)
    opt.zero_grad()
    at, tt_, vt, f4t = map(torch.tensor, (d["a"], d["t"], d["v"], d["f4"]))
    vals_t = torch.tensor(d["vals"])
    out0, emb0 = tmodel([at, tt_, vt, False])
    out1, emb1 = tmodel([at, f4t, vt, True])
    mse = ref_losses.MSELoss()
    rmse = ref_losses.RMSELoss()
    rnc = ref_losses.RnCLoss(temperature=2)
    nv = torch.stack((emb0[1], emb1[1]), dim=1)
    loss_t = (
        loss_cfg.full_mse_w * mse(out0, vals_t)
        + loss_cfg.missing_mse_w * mse(out1, vals_t)
        + loss_cfg.text_feat_w * rmse(emb1[2], emb0[2].detach())
        + loss_cfg.text_query_feat_w * rmse(emb1[3], emb0[3].detach())
        + loss_cfg.features_w * rmse(emb1[0], emb0[0])
        + loss_cfg.rnc_w * rnc(nv, vals_t.unsqueeze(1))
    )
    loss_t.backward()
    opt.step()

    sd = tmodel.state_dict()
    out = {f"init/{k}": v for k, v in init_sd.items()}
    out["loss_t"] = np.float32(loss_t.item())
    for path, (tk, transpose) in _ADAM_CHECKS.items():
        v = sd[tk].detach().numpy()
        out["post/" + "|".join(path)] = v.T if transpose else v
    return out


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_adam_step_parity_with_torch():
    """One full dual-view training step (dropout off) must move params the
    same way torch Adam(l2=1e-5) does under the reference loss (main:148).
    The torch side is frozen to tests/goldens (delete the npz to regenerate
    against the live reference)."""
    from tests.conftest import golden_npz

    golden = golden_npz("adam_step_parity", _adam_golden)
    loss_cfg = LossConfig()
    d = _adam_batch()

    cfg = ModelConfig(input_dims=INPUT_DIMS)
    jmodel = SDUMCFusion(cfg)
    dummy = tuple(jnp.zeros((2, 4, dd)) for dd in INPUT_DIMS)
    template = jmodel.init(jax.random.PRNGKey(0), *dummy)["params"]
    init_sd = {k[len("init/"):]: v for k, v in golden.items()
               if k.startswith("init/")}
    params, _ = torch_state_dict_to_params(init_sd, template)

    TA, TT, TV, TF = d["tmax"]
    batch = {
        "audio": jnp.array(d["a"]), "text": jnp.array(d["t"]),
        "video": jnp.array(d["v"]), "feat4": jnp.array(d["f4"]),
        "vals": jnp.array(d["vals"]),
        "t_max": tuple(jnp.int32(x) for x in (TA, TT, TV, TF)),
    }

    def loss_fn(p):
        return dual_view_loss(jmodel, p, batch, loss_cfg, jax.random.PRNGKey(0), deterministic=True)

    (loss_j, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    loss_t = float(golden["loss_t"])
    assert np.isclose(float(loss_j), loss_t, rtol=1e-4), (float(loss_j), loss_t)

    state = create_train_state(jmodel, params, lambda s: 1e-4, l2=1e-5)
    state = state.apply_gradients(grads=grads)

    for path in _ADAM_CHECKS:
        node = state.params
        for p in path:
            node = node[p]
        ref_val = golden["post/" + "|".join(path)]
        # atol 2e-4 = 2*lr: Adam's first step is ~±lr*sign(g), so framework
        # float noise on near-zero grads can flip single elements by ~lr.
        np.testing.assert_allclose(np.asarray(node), ref_val, rtol=2e-3, atol=2e-4)


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_training_decreases_loss():
    """Smoke: 30 steps on a learnable synthetic task shrink the loss."""
    cfg = ModelConfig(input_dims=(16, 32, 16), general_dim=32, layers=(32, 16), fused_layers=(32, 32))
    model = SDUMCFusion(cfg)
    rng = np.random.default_rng(0)
    B, T = 16, 8
    a = rng.normal(size=(B, T, 16)).astype(np.float32)
    t = rng.normal(size=(B, T, 32)).astype(np.float32)
    v = rng.normal(size=(B, T, 16)).astype(np.float32)
    f4 = rng.normal(size=(B, T, 32)).astype(np.float32)
    vals = np.tanh(a.mean(axis=(1, 2)) * 5).astype(np.float32)  # learnable signal

    template = model.init(
        jax.random.PRNGKey(1), jnp.array(a), jnp.array(t), jnp.array(v)
    )["params"]
    state = create_train_state(model, template, lambda s: 3e-3, l2=1e-5)
    step = make_train_step(model, LossConfig())
    batch = {
        "audio": jnp.array(a), "text": jnp.array(t), "video": jnp.array(v),
        "feat4": jnp.array(f4), "vals": jnp.array(vals),
        "t_max": tuple(jnp.int32(T) for _ in range(4)),
    }
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(40):
        state, metrics = step(state, dict(batch), key)
        if first is None:
            first = float(metrics["mse_full"])
    last = float(metrics["mse_full"])
    assert last < first * 0.8, (first, last)


def test_eval_step_runs():
    cfg = ModelConfig(input_dims=(8, 16, 8), general_dim=32, layers=(32, 16), fused_layers=(32, 32))
    model = SDUMCFusion(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, 8)), jnp.zeros((2, 4, 16)), jnp.zeros((2, 4, 8)),
    )["params"]
    ev = make_eval_step(model)
    batch = {
        "audio": jnp.zeros((2, 4, 8)), "text": jnp.zeros((2, 4, 16)),
        "video": jnp.zeros((2, 4, 8)), "feat4": jnp.zeros((2, 4, 16)),
        "vals": jnp.zeros(2),
        "t_max": tuple(jnp.int32(4) for _ in range(4)),
    }
    v0, v1 = ev(params, batch)
    assert v0.shape == v1.shape == (2,)


@pytest.mark.slow
def test_resume_roundtrip(tmp_path):
    """Fault-tolerant resume: params+optimizer+bests survive a restart and
    the continued run matches an uninterrupted one."""
    from sdumc_tpu.data.feature_store import SyntheticSource
    from sdumc_tpu.data.pipeline import MoseiDataset
    from sdumc_tpu.train.loop import train

    dims = {"audio": 16, "text": 32, "video": 16, "feat4": 32}
    sources = {k: SyntheticSource(k, d, 4, 16) for k, d in dims.items()}
    rng = np.random.default_rng(0)
    names = [f"c{i}" for i in range(24)]
    labels = [{"emo": 0.0, "val": float(rng.uniform(-3, 3))} for _ in names]
    ds = MoseiDataset(names, labels, sources)

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, length_buckets=(16,)),
        model=ModelConfig(input_dims=(16, 32, 16), general_dim=32, layers=(32, 16), fused_layers=(32, 32)),
        train=TrainConfig(epochs=2, lr=1e-3, checkpoint_dir=str(tmp_path / "ck")),
    )
    model = SDUMCFusion(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, 16)), jnp.zeros((2, 4, 32)), jnp.zeros((2, 4, 16)),
    )["params"]
    import jax as _jax
    params2 = _jax.tree_util.tree_map(np.array, params)

    full = train(cfg, model, params, ds, ds, ds, log=lambda *a: None)

    # interrupted: 1 epoch, then resume for the second
    cfg1 = ExperimentConfig(
        data=cfg.data, model=cfg.model,
        train=TrainConfig(epochs=1, lr=1e-3, checkpoint_dir=str(tmp_path / "ck2")),
    )
    train(cfg1, model, params2, ds, ds, ds, log=lambda *a: None)
    cfg2 = ExperimentConfig(
        data=cfg.data, model=cfg.model,
        train=TrainConfig(epochs=2, lr=1e-3, checkpoint_dir=str(tmp_path / "ck2")),
    )
    resumed = train(cfg2, model, params2, ds, ds, ds, log=lambda *a: None,
                    resume_from=str(tmp_path / "ck2" / "latest"))

    assert np.isclose(resumed["best_full"]["mae"], full["best_full"]["mae"], rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(full["state"].params)
    l2 = jax.tree_util.tree_leaves(resumed["state"].params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_bf16_feature_dtype_close_to_f32():
    """DataConfig.feature_dtype='bfloat16' halves feature HBM traffic; the
    eval output must stay numerically indistinguishable (first projection
    accumulates in f32)."""
    import dataclasses

    from sdumc_tpu.data.collate import Batch
    from sdumc_tpu.train.step import batch_to_device_dict

    cfg = ModelConfig(input_dims=(8, 16, 8), general_dim=32, layers=(32, 16),
                      fused_layers=(32, 32))
    model = SDUMCFusion(cfg)
    rng = np.random.default_rng(0)
    B, T = 4, 6
    batch = Batch(
        audio=rng.normal(size=(B, T, 8)).astype(np.float32),
        text=rng.normal(size=(B, T, 16)).astype(np.float32),
        video=rng.normal(size=(B, T, 8)).astype(np.float32),
        feat4=rng.normal(size=(B, T, 16)).astype(np.float32),
        emos=np.zeros(B, np.float32), vals=np.zeros(B, np.float32),
        lengths=np.full((4, B), T, np.int32), names=[str(i) for i in range(B)],
        t_max=(T, T, T, T),
    )
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 4, 8)), jnp.zeros((2, 4, 16)),
                        jnp.zeros((2, 4, 8)))["params"]
    ev = make_eval_step(model)
    d32 = batch_to_device_dict(batch)
    d16 = batch_to_device_dict(batch, feature_dtype="bfloat16")
    assert d16["audio"].dtype == jnp.bfloat16
    v32, _ = ev(params, d32)
    v16, _ = ev(params, d16)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                               rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_preemption_resume_matches_uninterrupted(tmp_path):
    """PreemptionGuard path: a mid-epoch 'SIGTERM' saves the epoch-boundary
    snapshot; --resume replays the epoch and the continued run is
    step-for-step identical to an uninterrupted one."""
    from sdumc_tpu.data.feature_store import SyntheticSource
    from sdumc_tpu.data.pipeline import MoseiDataset
    from sdumc_tpu.train.loop import train

    dims = {"audio": 16, "text": 32, "video": 16, "feat4": 32}
    sources = {k: SyntheticSource(k, d, 4, 16) for k, d in dims.items()}
    rng = np.random.default_rng(0)
    names = [f"c{i}" for i in range(24)]
    labels = [{"emo": 0.0, "val": float(rng.uniform(-3, 3))} for _ in names]
    ds = MoseiDataset(names, labels, sources)

    def make_cfg(ckpt):
        return ExperimentConfig(
            data=DataConfig(batch_size=8, length_buckets=(16,)),
            model=ModelConfig(input_dims=(16, 32, 16), general_dim=32,
                              layers=(32, 16), fused_layers=(32, 32)),
            train=TrainConfig(epochs=2, lr=1e-3, checkpoint_dir=str(ckpt)),
        )

    model = SDUMCFusion(make_cfg(tmp_path).model)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, 16)), jnp.zeros((2, 4, 32)), jnp.zeros((2, 4, 16)),
    )["params"]
    fresh = lambda: jax.tree_util.tree_map(np.array, params)  # noqa: E731

    full = train(make_cfg(tmp_path / "a"), model, fresh(), ds, ds, ds,
                 log=lambda *a: None)

    class Countdown:  # fires on the 5th per-step poll (epoch 1, step 2)
        def __init__(self, n):
            self.n = n

        @property
        def fired(self):
            self.n -= 1
            return self.n < 0

    r = train(make_cfg(tmp_path / "b"), model, fresh(), ds, ds, ds,
              log=lambda *a: None, preemption_guard=Countdown(4))
    assert r.get("preempted") is True

    resumed = train(make_cfg(tmp_path / "b"), model, fresh(), ds, ds, ds,
                    log=lambda *a: None,
                    resume_from=str(tmp_path / "b" / "latest"))
    assert resumed["history"][-1]["epoch"] == full["history"][-1]["epoch"]
    assert (resumed["history"][-1]["test"]["full"]["mae"]
            == full["history"][-1]["test"]["full"]["mae"])
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(full["state"].params),
        jax.tree_util.tree_leaves_with_path(resumed["state"].params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))
