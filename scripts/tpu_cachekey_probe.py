"""Diagnose cross-process persistent-compilation-cache misses on the axon
TPU tunnel.

The r4 pipeline profile showed every fresh process re-compiling programs
that an earlier session had already cached (near-duplicate cache files,
different keys) — ~200 s of remote compiles per bench run.  The cache key
(jax._src.cache_key.get) hashes: computation, jaxlib version,
backend.platform_version, XLA flags, compile_options, accelerator_config.
This probe logs the per-component hashes for one fixed computation plus
the raw platform_version string; run it in two separate processes and
diff the outputs to identify which component drifts between tunnel
sessions.

Appends one JSON line per run to scripts/tpu_cachekey_probe_log.jsonl.
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

records = {}


class _Capture(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "get_cache_key hash of serialized" in msg:
            parts = msg.split("serialized ")[1].rsplit(": ", 1)
            records[parts[0]] = parts[1].strip()


logger = logging.getLogger("jax._src.cache_key")
logger.setLevel(logging.DEBUG)
logger.addHandler(_Capture())


def main():
    t0 = time.time()

    @jax.jit
    def probe(x):
        # fixed distinctive computation: identical module every run
        def body(c, _):
            c = jnp.tanh(c @ c + 0.003)
            return c, jnp.sum(c)
        out, s = jax.lax.scan(body, x, None, length=7)
        return jnp.sum(out) + jnp.sum(s)

    x = jnp.full((128, 128), 0.01, jnp.float32)
    t1 = time.time()
    probe(x).block_until_ready()
    compile_wall = time.time() - t1

    dev = jax.devices()[0]
    client = dev.client
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "pid": os.getpid(),
        "init_s": round(t1 - t0, 1),
        "first_call_s": round(compile_wall, 2),
        "backend": jax.default_backend(),
        "platform_version": getattr(client, "platform_version", "?"),
        "device_repr": repr(dev),
        "component_hashes": dict(records),
    }
    try:
        from jax._src.lib import xla_client
        topo = xla_client.get_topology_for_devices([dev]).serialize()
        import hashlib
        rec["topology_sha"] = hashlib.sha256(topo).hexdigest()[:16]
        rec["topology_len"] = len(topo)
    except Exception as e:  # noqa: BLE001
        rec["topology_sha"] = f"error: {str(e)[:120]}"

    path = os.path.join(os.path.dirname(__file__),
                        "tpu_cachekey_probe_log.jsonl")
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
