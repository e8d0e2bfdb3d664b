"""Measured same-host CPU comparison: reference torch train step vs tinynerf
jitted CPU step, production config (400 rays, 64+128 samples)."""
import sys, time
import numpy as np
import os
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO); sys.path.insert(0, os.path.join(_REPO, "tests"))
import conftest
import torch
torch.set_num_threads(1)
sys.path.insert(0, "/root/reference")
import nerf as refnerf
sys.path.pop(0)
refnerf.device = torch.device("cpu")
torch.manual_seed(0)
import jax, jax.numpy as jnp
from tinynerf import ckpt, optim
from tinynerf.config import Config
from tinynerf import train as trainlib
from tinynerf.core.rays import make_k_inv
from tinynerf.data.rays import RayBatch

B, NC, NF = 400, 64, 128
H = W = 100.0; F = 120.0
model = refnerf.NeRFModel(num_coarse=NC, num_fine=NF, batch_ray=B)
opt = torch.optim.Adam(model.network.parameters(), lr=5e-4, betas=(0.9, 0.999), eps=1e-7)

rng = np.random.default_rng(0)
row = rng.integers(0, 100, B).astype(np.float32)
col = rng.integers(0, 100, B).astype(np.float32)
rgb = rng.uniform(0, 1, (B, 3)).astype(np.float32)
c2w = np.eye(4, dtype=np.float32); c2w[:3, 3] = [0, 0, 4.0]
hwf = np.array([[H],[W],[F]], np.float32)
pose17 = np.tile(np.concatenate([np.concatenate([c2w[:3,:4],hwf],1).flatten(),[2.0,6.0]]), (B,1)).astype(np.float32)
k_inv_t = torch.tensor([[1.0,0.0,-0.5*W],[0.0,-1.0,0.5*H],[0.0,0.0,-F]]).to(torch.float).transpose(0,1)

def tstep():
    opt.zero_grad()
    model.train()
    cc, cf = model(torch.tensor(row), torch.tensor(col), torch.tensor(pose17), k_inv_t)
    loss = model.ray_loss(cc, cf, torch.tensor(rgb))
    loss.backward()
    opt.step()

if "--render" in sys.argv:
    # display()-style unit of work: no_grad forward per 400-ray batch
    # (reference nerf.py:510-520); an 800x800 view is 1,600 such batches
    model.eval()
    def rstep():
        with torch.no_grad():
            model(torch.tensor(row), torch.tensor(col),
                  torch.tensor(pose17), k_inv_t)
    rstep()  # warmup
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        rstep()
    dt = (time.perf_counter() - t0) / n
    print(f"reference torch CPU render: {dt*1e3:.1f} ms/batch "
          f"-> {dt * (800 * 800 / B):,.0f} s per 800x800 frame "
          f"({B / dt:,.0f} rays/s)")
    sys.exit(0)

tstep()  # warmup
n = 5
t0 = time.perf_counter()
for _ in range(n):
    tstep()
dt = (time.perf_counter() - t0) / n
ref_rays = B / dt
print(f"reference torch CPU: {dt*1e3:.1f} ms/step -> {ref_rays:,.0f} rays/s")

# --- tinynerf on the same CPU ---
cfg = Config(batch_ray=B, n_coarse=NC, n_fine=NF, use_pallas=False,
             stratified=False, learning=5e-4)
k_inv = make_k_inv(H, W, F)
loss_fn = trainlib.make_loss_fn(cfg, k_inv)
batch = RayBatch(rows=jnp.asarray(row), cols=jnp.asarray(col), rgb=jnp.asarray(rgb),
                 pose17=jnp.asarray(pose17), pic=jnp.zeros(B, jnp.int32))
sd = {k: v.detach().numpy() for k, v in model.network.state_dict().items()}
params = ckpt.import_torch_state_dict(sd)
opt_j = optim.adam_init(params)

@jax.jit
def jstep(p, o):
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, None, None)
    return optim.adam_update(grads, o, p, jnp.float32(5e-4))

p, o = jstep(params, opt_j)
jax.block_until_ready(p)
t0 = time.perf_counter()
for _ in range(n):
    p, o = jstep(p, o)
jax.block_until_ready(p)
dt = (time.perf_counter() - t0) / n
j_rays = B / dt
print(f"tinynerf jax CPU:    {dt*1e3:.1f} ms/step -> {j_rays:,.0f} rays/s")
print(f"same-host CPU ratio: {j_rays/ref_rays:.2f}x")
