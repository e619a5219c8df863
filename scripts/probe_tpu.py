"""Cheap TPU tunnel probe: import jax, compile a trivial kernel, print OK."""
import time
t0 = time.time()
import jax, jax.numpy as jnp
print(f"jax imported {time.time()-t0:.1f}s, devices={jax.devices()}", flush=True)
x = jnp.ones((128, 128))
y = float(jnp.sum(x @ x))
print(f"OK compile+fetch {time.time()-t0:.1f}s sum={y}", flush=True)
