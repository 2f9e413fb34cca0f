import time
import numpy as np
import mitransient_tpu as mitr
scene = mitr.load_dict(mitr.cornell_box())
t0 = time.time()
s, t, stats = mitr.render(scene, spp=32, seed=0, return_stats=True)
s.block_until_ready(); t.block_until_ready()
print("first (compile):", round(time.time()-t0, 1), flush=True)
for seed in (1, 2):
    t0 = time.perf_counter()
    s, t, stats = mitr.render(scene, spp=32, seed=seed, return_stats=True)
    s.block_until_ready(); t.block_until_ready()
    dt = time.perf_counter()-t0
    print(f"render spp32 seed{seed}: {dt:.3f}s -> {float(stats['rays'])/dt/1e6:.1f} Mrays/s", flush=True)
st, tr = np.asarray(s), np.asarray(t)
prof = tr.sum(axis=(0,1,3)); nz = prof.nonzero()[0]
print("first bin:", nz[0], "energy ratio:", tr.sum()/st.sum(), flush=True)
