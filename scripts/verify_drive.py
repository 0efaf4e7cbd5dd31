"""User-flow drive: reference torch ckpt -> sdumc_tpu on TPU -> metrics."""
import sys, types, time
sys.path.insert(0, "/root/repo")
import importlib.util, numpy as np, torch

# 1. make a "released-style" torch checkpoint (module. prefixes, state_dict key)
spec = importlib.util.spec_from_file_location(
    "ref_model", "/root/reference/toolkit/models/wengnet_mosei_mult_views_text_missing.py")
ref = importlib.util.module_from_spec(spec); spec.loader.exec_module(ref)
torch.manual_seed(7)
tmodel = ref.WengnetMOSEIMultViewsTextMissing(types.SimpleNamespace(input_dims=[1024, 4096, 1024]))
tmodel.eval()
sd = {"module.model." + k: v for k, v in tmodel.state_dict().items()}
torch.save({"epoch": 17, "state_dict": sd, "optimizer": {}}, "/tmp/verify_drive/ckpt.pt")
nparams = sum(p.numel() for p in tmodel.parameters())
print(f"torch ckpt saved, {nparams/1e6:.1f}M params")

# 2. the sdumc_tpu user flow (public API only)
import jax, jax.numpy as jnp
print("devices:", jax.devices())
from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.models import get_model
from sdumc_tpu.convert import load_torch_checkpoint
from sdumc_tpu.core.metrics import eval_mosei_metric

cfg = ModelConfig()
model = get_model(cfg)
template = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((2, 8, 1024)), jnp.zeros((2, 8, 4096)), jnp.zeros((2, 8, 1024)))["params"]
params, report = load_torch_checkpoint("/tmp/verify_drive/ckpt.pt", template)
print("convert report: unmapped=%d missing=%d" % (len(report["unmapped"]), len(report["missing"])))

rng = np.random.default_rng(0)
B, TA, TT, TV = 32, 256, 32, 64
a = rng.normal(size=(B, TA, 1024)).astype(np.float32)
t = rng.normal(size=(B, TT, 4096)).astype(np.float32)
v = rng.normal(size=(B, TV, 1024)).astype(np.float32)
f4 = rng.normal(size=(B, 40, 4096)).astype(np.float32)
f4p = f4[:, :TT]

@jax.jit
def infer(params, a, t, v):
    return model.apply({"params": params}, a, t, v)[0]

t0 = time.time(); full = infer(params, jnp.array(a), jnp.array(t), jnp.array(v)); full.block_until_ready()
print(f"first call (compile) {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(5):
    full = infer(params, jnp.array(a), jnp.array(t), jnp.array(v))
full.block_until_ready()
print(f"steady: {5*B/(time.time()-t0):.0f} clips/s on {jax.devices()[0].device_kind}")

# 3. parity vs torch at the surface
with torch.no_grad():
    tv_full, _ = tmodel([torch.tensor(a), torch.tensor(t), torch.tensor(v), False])
diff = np.max(np.abs(np.asarray(full) - tv_full.numpy()))
print(f"TPU-vs-torch max|diff| = {diff:.2e}")

labels = rng.uniform(-3, 3, size=B)
m = eval_mosei_metric(np.asarray(full), labels)
print("metrics:", {k: round(v, 4) for k, v in list(m.items())[:4]})
assert diff < 2e-3, "parity broken"
print("DRIVE OK")
