import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from functools import partial
import raytracingtest_tpu as rt
from raytracingtest_tpu.io import checkpoint as ckpt
from raytracingtest_tpu.ops import tile
from raytracingtest_tpu.ops.camera import Camera

print("# devices:", jax.devices(), file=sys.stderr)
svo_host = ckpt.load_svo("/tmp/bench_svo_terrain_d10.npz")
ts = tile.make_tile_svo(svo_host).device()
cam = Camera(position=(0.5, 0.85, -0.6), look_at=(0.5, 0.4, 0.5),
             fov_y_deg=50.0, width=1024, height=1024)
tpx, k_max, m_slots = 8, 48, 6
o, d, corners, grid = tile.tile_rays(cam, np, tile_px=tpx)
o = jnp.asarray(o); d = jnp.asarray(d); corners = jnp.asarray(corners)
pyr, cellmap, bricks = jnp.asarray(ts.pyr), jnp.asarray(ts.cellmap), jnp.asarray(ts.bsvo.bricks)
apex = o[0, 0]
T, P = o.shape[:2]; n = T * P
caps = tile._default_caps(ts.top_depth, k_max)

cand = jax.jit(lambda: tile._candidates(pyr, cellmap, corners, apex,
                                        ts.top_depth, caps, k_max))

def mk_st():
    st0 = tile.init_state(o.reshape(n,3), d.reshape(n,3), ts.top_depth, jnp)
    return dict(t_coef=st0.t_coef.reshape(T,P,3), t_bias=st0.t_bias.reshape(T,P,3),
                om=st0.octant_mask.reshape(T,P), t0=st0.t_min.reshape(T,P),
                miss0=st0.done.reshape(T,P))
st_f = jax.jit(mk_st)

sel = jax.jit(lambda st, codes, ids, t_codes: tile._select_slots(
    st, codes, ids, t_codes, ts.top_depth, m_slots, k_max))
dda = jax.jit(lambda st, s_t, s_id, s_code: tile._brick_dda(
    st, bricks, s_t, s_id, s_code, ts.depth, ts.top_depth))

def fence(x):
    return float(sum(jnp.sum(jnp.asarray(v).astype(jnp.float32))
                     for v in jax.tree_util.tree_leaves(x)))

def t(name, f, reps=4):
    r = f(); fence(r)
    t0 = time.time()
    for _ in range(reps): r = f(); fence(r)
    print(f"{name:12s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return r

c = t("candidates", cand)
st = t("init_state", st_f)
s = t("select(R1)", lambda: sel(st, c[0], c[1], c[2]))
h = t("dda(R2)", lambda: dda(st, s[0], s[1], s[2]))
