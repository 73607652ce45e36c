"""Per-stage COLD-process attribution of the coreset/finalisation phase
(VERDICT r5 #3: where does the first-process fit's compile tax go?).

On the axon backend a jit call returns after trace + REMOTE COMPILE with
execution dispatched async, so in a fresh process each call's wall time is
almost entirely its compile cost (the per-program pattern CLAUDE.md
documents: the remote-compile path bypasses every persistent cache).  This
script times each finalisation program CALL at exact production shapes
(200-sample class: xyz bank 627200x768, rgb bank 156800x768) in one fresh
process, then a bulk device_get for the total device drain.

Run it in an idle window — its compiles queue behind (and ahead of) any
other in-flight compile requests (CLAUDE.md).

Usage: python benchmarks/probe_finalize.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cmdiad_tpu.methods import base as mb
from cmdiad_tpu.ops import coreset as cs

out = {}


def t(name, fn):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    out[name] = round(dt, 2)
    print(f"{name}: call returned in {dt:.2f}s", flush=True)
    return r


def one_bank(tag, n_chunks, chunk_rows, n_rows, n_sel, iters):
    rng = np.random.default_rng(0)
    chunks = tuple(
        jnp.asarray(rng.normal(size=(chunk_rows, 768)).astype(np.float32))
        for _ in range(n_chunks))
    cat, m, s = t(f"{tag}.cat_mean_std", lambda: mb._cat_mean_std(chunks))
    t(f"{tag}.float_sync", lambda: (float(m), float(s)))
    normed = t(f"{tag}.normalize",
               lambda: mb._normalize(cat, m, s))
    idx = t(f"{tag}.coreset_select",
            lambda: cs.coreset_select(normed, 0.1))
    padded = t(f"{tag}.gather_pad", lambda: mb._gather_pad(normed, idx))
    tab = t(f"{tag}.nn_table",
            lambda: mb._bank_nn_table_jit(padded, jnp.int32(idx.shape[0]),
                                          k=3, metric="l2"))
    t(f"{tag}.drain(device_get)", lambda: jax.device_get(tab))


print("devices:", jax.devices(), flush=True)
t0_all = time.perf_counter()
# xyz bank of a 200-sample class: 25 batches x (8 x 3136) rows
one_bank("xyz", 25, 25088, 627200, 62720, 65536)
# rgb bank: 25 batches x (8 x 784) rows
one_bank("rgb", 25, 6272, 156800, 15680, 16384)
out["total_s"] = round(time.perf_counter() - t0_all, 1)
print(json.dumps(out), flush=True)
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "probe_finalize.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
