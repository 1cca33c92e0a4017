"""End-to-end library drive: what a Move2Hear user does, through public API."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())

from move2hear_tpu.ops import render_binaural_mixture, istft_mag_phase, stft_mag_phase
from move2hear_tpu.models import Move2HearPolicy

rng = np.random.default_rng(7)

# --- 1. a user's "scene": 2 sources x 4 envs, 1s @16kHz mono + binaural RIRs
B, S = 4, 2
mono = (rng.standard_normal((B, S, 16000)) * 9000).astype(np.float32)
rirs = (rng.standard_normal((B, S, 2000, 2)) * 0.08).astype(np.float32)

t0 = time.time()
out = render_binaural_mixture(mono, rirs, gt_mono_mag_norm=1.2)
jax.block_until_ready(out)
t1 = time.time()
out2 = render_binaural_mixture(mono, rirs, gt_mono_mag_norm=1.2)
jax.block_until_ready(out2)
t2 = time.time()
print(f"frontend: compile+run {t1-t0:.2f}s, steady {t2-t1:.4f}s for B={B},S={S}")
print("mixed mag shape", out.mixed_bin_audio_mag.shape,
      "range [%.3f, %.3f]" % (float(out.mixed_bin_audio_mag.min()), float(out.mixed_bin_audio_mag.max())))
assert out.mixed_bin_audio_mag.shape == (B, 512, 32, 2)
assert bool(jnp.isfinite(out.mixed_bin_audio_mag).all())

# --- 2. full policy: separate + act
obs = {
    "rgb": jnp.asarray(rng.uniform(0, 255, (B, 128, 128, 3)), jnp.float32),
    "depth": jnp.asarray(rng.uniform(0, 1, (B, 128, 128, 1)), jnp.float32),
    "mixed_bin_audio_mag": out.mixed_bin_audio_mag,
    "target_class": jnp.zeros((B, 1), jnp.int32),
}
policy = Move2HearPolicy(num_actions=4, hidden_size=512, use_ddppo=True)
hidden = jnp.zeros((B, 512))
masks = jnp.ones((B, 1))
variables = policy.init(jax.random.PRNGKey(0), obs, hidden, masks)
n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
print(f"policy params: {n_params/1e6:.2f}M")

@jax.jit
def step(variables, obs, hidden, masks, rng_key):
    pm = policy.apply(variables, obs, method=Move2HearPolicy.get_binSepMasks)
    mono_p = policy.apply(variables, pm, obs["mixed_bin_audio_mag"],
                          method=Move2HearPolicy.convert_bin2mono)
    mem = policy.apply(variables, mono_p, jnp.zeros_like(mono_p),
                       method=Move2HearPolicy.get_monoFromMem)
    act = policy.apply(variables, obs, hidden, masks, pm, mono_p, mem,
                       rng_key, False, method=Move2HearPolicy.act)
    return pm, mono_p, mem, act

t0 = time.time()
pm, mono_p, mem, act = step(variables, obs, hidden, masks, jax.random.PRNGKey(1))
jax.block_until_ready(act)
t1 = time.time()
pm, mono_p, mem, act = step(variables, obs, hidden, masks, jax.random.PRNGKey(2))
jax.block_until_ready(act)
t2 = time.time()
print(f"policy step: compile+run {t1-t0:.2f}s, steady {t2-t1:.4f}s")
print("actions:", np.asarray(act.action).ravel(), "values:", np.asarray(act.value).ravel())
print("probs[0]:", np.asarray(act.probs)[0])
assert act.action.shape == (B, 1) and (np.asarray(act.action) >= 0).all() and (np.asarray(act.action) < 4).all()
assert np.isfinite(np.asarray(act.value)).all()
assert np.allclose(np.asarray(act.probs).sum(-1), 1, atol=1e-5)

# --- 3. separated audio back to a waveform (the eval path)
gm = out.gt_mono_comps
sig = istft_mag_phase(mono_p[0, :, :, 0], gm[0, :, :, 1], length=16000)
print("reconstructed waveform:", np.asarray(sig).shape, "rms %.4f" % float(np.sqrt(np.mean(np.asarray(sig)**2))))
assert np.asarray(sig).shape == (16000,)

# --- probe: degenerate inputs
z = render_binaural_mixture(np.zeros((1, 2, 16000), np.float32),
                            np.zeros((1, 2, 100, 2), np.float32), gt_mono_mag_norm=1.2)
assert bool(jnp.isfinite(z.mixed_bin_audio_mag).all()), "zero-input NaN!"
assert float(jnp.abs(z.mixed_bin_audio_mag).max()) == 0.0
print("zero-RIR fallback: finite, silent ✓")

# probe: mismatched batch shapes raise cleanly
try:
    render_binaural_mixture(np.zeros((2, 2, 16000), np.float32), np.zeros((3, 2, 100, 2), np.float32))
    print("PROBE FAIL: shape mismatch did not raise")
except Exception as e:
    print("shape-mismatch probe -> raised:", type(e).__name__)

print("ALL E2E CHECKS PASSED")
