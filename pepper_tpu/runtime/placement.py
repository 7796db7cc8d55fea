"""Host->device placement with a zero-copy CPU fast path.

On CPU backends `jax.dlpack.from_dlpack` imports the numpy buffer
without copying — the buffer's lifetime is tied to the returned array,
and every call site hands over a freshly materialized batch that is
never mutated afterwards, so aliasing is safe.

Round-5 finding recorded here for operators: this machine's TPU-tunnel
plugin (sitecustomize-registered jax platform) retains EVERY staged
host buffer of a host->device transfer — RSS grows by ~bytes
transferred on its 'tpu' backend, never freed even by Array.delete()
(bisected; a config-forced CPU backend and stock jax are both
leak-free, and no alternative transfer path avoids it: device_put,
dlpack staging, and io_callback all leak or hang through the tunnel).
At real-data candidate density (~2k/Mbp) a whole-genome run leaks a few
GB of host RAM through the tunnel; real TPU hosts run stock jax and are
unaffected. Note that under the plugin the JAX_PLATFORMS environment
variable is ignored — use jax.config.update("jax_platforms", "cpu") to
actually select the CPU backend.
"""


def place_host_array(x, jnp=None):
    """Place a numpy array onto the default device; zero-copy on CPU."""
    import jax
    import jax.numpy as _jnp
    jnp = jnp or _jnp
    if jax.devices()[0].platform == "cpu":
        try:
            return jax.dlpack.from_dlpack(x)
        except Exception:
            pass
    return jnp.asarray(x)
