"""Arena bulk-update throughput (VERDICT round-2 target: >=100k msgs/s).

Measures the full path: host batch build (python) + device arena_update.
Run: python tools/bench_arena.py [n_msgs_per_batch] [n_batches]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from readsb_tpu.decode.fields import ModesMessage, Source
from readsb_tpu.track.arena import Arena, FIELDS, ATTR_OF

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
B = int(sys.argv[2]) if len(sys.argv) > 2 else 20

rng = np.random.default_rng(0)
addrs = rng.integers(0x100000, 0x100000 + 10000, M * B)  # 10k aircraft
t = 1_000_000
batches = []
for b in range(B):
    msgs = []
    for i in range(M):
        t += 1
        mm = ModesMessage(msgtype=17, addr=int(addrs[b * M + i]),
                          source=Source.ADSB, sys_timestamp_ms=t)
        mm.gs_selected = 450.0
        mm.baro_rate = -640.0
        mm.ias = 280.0
        msgs.append(mm)
    batches.append(msgs)

_ = float(jnp.sum(jnp.zeros(4)))  # honest timing through the axon relay

arena = Arena()
arena.update_batch(batches[0])  # compile
jax.block_until_ready(arena.state.fval)

t0 = time.perf_counter()
for msgs in batches:
    arena.update_batch(msgs)
jax.block_until_ready(arena.state.fval)
dt = time.perf_counter() - t0
total = M * B
print(f"arena bulk update: {total} msgs in {dt*1e3:.1f} ms "
      f"-> {total/dt/1e3:.0f}k msgs/s ({len(arena.slot_of)} aircraft)")
