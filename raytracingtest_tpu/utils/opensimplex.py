"""OpenSimplex 3D noise with numerical parity to the reference.

The reference's terrain scenes are built on SE.OpenSimplexNoise
(/root/reference/Assets/Scripts/Utility/Noise/Simplex.cs:1-444 — Kurt
Spencer's public-domain OpenSimplex in its lookup-table formulation;
consumed by Assets/Scripts/Utility/SampleFunctions.cs:30-47). Rounds 1-3
substituted a home-grown gradient noise, so no scene in the framework was
numerically comparable to the reference's (VERDICT r03 missing 3). This
module closes that gap.

TPU-first redesign: the reference walks a per-point linked list of lattice
contributions selected by a region hash (Simplex.cs:299-323). Linked chains
and data-dependent loops don't vectorize; here the 2048-entry hash table is
flattened at construction into dense padded arrays (hash, MAX_CHAIN) of
contribution offsets, and evaluation is fully-batched numpy/jnp: one hash
per point, a fixed MAX_CHAIN of masked contribution terms, three chained
256-entry permutation gathers per term. Bit-level parity with the scalar
semantics (float64) is tested against the independent per-point twin in
reference/opensimplex_scalar.py on a grid (tests/test_opensimplex.py).
"""

from __future__ import annotations

import numpy as np

STRETCH_3D = -1.0 / 6.0          # (1/sqrt(3+1)-1)/3
SQUISH_3D = 1.0 / 3.0            # (sqrt(3+1)-1)/3
NORM_3D = 1.0 / 103.0

# gradient set: the 24 edge-ish directions (+-11,+-4,+-4) permutations
GRADIENTS_3D = np.array([
    -11, 4, 4, -4, 11, 4, -4, 4, 11,
    11, 4, 4, 4, 11, 4, 4, 4, 11,
    -11, -4, 4, -4, -11, 4, -4, -4, 11,
    11, -4, 4, 4, -11, 4, 4, -4, 11,
    -11, 4, -4, -4, 11, -4, -4, 4, -11,
    11, 4, -4, 4, 11, -4, 4, 4, -11,
    -11, -4, -4, -4, -11, -4, -4, -4, -11,
    11, -4, -4, 4, -11, -4, 4, -4, -11,
], np.float64).reshape(24, 3)

# Published OpenSimplex 3D lattice tables (Kurt Spencer, public domain) —
# the same data constants as the reference port
# (/root/reference/Assets/Scripts/Utility/Noise/Simplex.cs:104-117); like the
# ESVO child-offset tables, these ARE the algorithm and admit no redesign.

_BASE3D = (
    (0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 1),
    (2, 1, 1, 0, 2, 1, 0, 1, 2, 0, 1, 1, 3, 1, 1, 1),
    (1, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 1, 2, 1, 1, 0, 2, 1, 0, 1, 2, 0, 1, 1),
)

_P3D = (
    0, 0, 1, -1, 0, 0, 1, 0, -1, 0, 0, -1, 1, 0, 0, 0,
    1, -1, 0, 0, -1, 0, 1, 0, 0, -1, 1, 0, 2, 1, 1, 0,
    1, 1, 1, -1, 0, 2, 1, 0, 1, 1, 1, -1, 1, 0, 2, 0,
    1, 1, 1, -1, 1, 1, 1, 3, 2, 1, 0, 3, 1, 2, 0, 1,
    3, 2, 0, 1, 3, 1, 0, 2, 1, 3, 0, 2, 1, 3, 0, 1,
    2, 1, 1, 1, 0, 0, 2, 2, 0, 0, 1, 1, 0, 1, 0, 2,
    0, 2, 0, 1, 1, 0, 0, 1, 2, 0, 0, 2, 2, 0, 0, 0,
    0, 1, 1, -1, 1, 2, 0, 0, 0, 0, 1, -1, 1, 1, 2, 0,
    0, 0, 0, 1, 1, 1, -1, 2, 3, 1, 1, 1, 2, 0, 0, 2,
    2, 3, 1, 1, 1, 2, 2, 0, 0, 2, 3, 1, 1, 1, 2, 0,
    2, 0, 2, 1, 1, -1, 1, 2, 0, 0, 2, 2, 1, 1, -1, 1,
    2, 2, 0, 0, 2, 1, -1, 1, 1, 2, 0, 0, 2, 2, 1, -1,
    1, 1, 2, 0, 2, 0, 2, 1, 1, 1, -1, 2, 2, 0, 0, 2,
    1, 1, 1, -1, 2, 0, 2, 0,
)

_LOOKUP_PAIRS_3D = (
    0, 2, 1, 1, 2, 2, 5, 1, 6, 0, 7, 0, 32, 2, 34, 2,
    129, 1, 133, 1, 160, 5, 161, 5, 518, 0, 519, 0, 546, 4, 550, 4,
    645, 3, 647, 3, 672, 5, 673, 5, 674, 4, 677, 3, 678, 4, 679, 3,
    680, 13, 681, 13, 682, 12, 685, 14, 686, 12, 687, 14, 712, 20, 714, 18,
    809, 21, 813, 23, 840, 20, 841, 21, 1198, 19, 1199, 22, 1226, 18, 1230, 19,
    1325, 23, 1327, 22, 1352, 15, 1353, 17, 1354, 15, 1357, 17, 1358, 16, 1359, 16,
    1360, 11, 1361, 10, 1362, 11, 1365, 10, 1366, 9, 1367, 9, 1392, 11, 1394, 11,
    1489, 10, 1493, 10, 1520, 8, 1521, 8, 1878, 9, 1879, 9, 1906, 7, 1910, 7,
    2005, 6, 2007, 6, 2032, 8, 2033, 8, 2034, 7, 2037, 6, 2038, 7, 2039, 6,
)


MAX_CHAIN = 9  # longest hash-class chain (6 base + 2 extra; padded)


def _build_contributions():
    """Flatten the linked contribution chains into dense padded arrays.

    Returns (lut_d (2048, MAX_CHAIN, 3) f64 offsets dx/dy/dz,
             lut_sb (2048, MAX_CHAIN, 3) i64 lattice offsets,
             lut_n (2048,) chain lengths). Unused hash slots get length 0;
    padding entries have dx=1e30 so their attenuation is always <= 0.
    """
    chains = []
    for i in range(0, len(_P3D), 9):
        base = _BASE3D[_P3D[i]]
        chain = []
        for k in range(0, len(base), 4):
            chain.append((base[k], base[k + 1], base[k + 2], base[k + 3]))
        chain.append((_P3D[i + 1], _P3D[i + 2], _P3D[i + 3], _P3D[i + 4]))
        chain.append((_P3D[i + 5], _P3D[i + 6], _P3D[i + 7], _P3D[i + 8]))
        chains.append(chain)

    lut_d = np.full((2048, MAX_CHAIN, 3), 1e30, np.float64)
    lut_sb = np.zeros((2048, MAX_CHAIN, 3), np.int64)
    lut_n = np.zeros(2048, np.int64)
    for h, ci in zip(_LOOKUP_PAIRS_3D[::2], _LOOKUP_PAIRS_3D[1::2]):
        chain = chains[ci]
        lut_n[h] = len(chain)
        for j, (mult, xsb, ysb, zsb) in enumerate(chain):
            sb = np.array([xsb, ysb, zsb], np.int64)
            lut_d[h, j] = -sb - mult * SQUISH_3D
            lut_sb[h, j] = sb
    return lut_d, lut_sb, lut_n


_LUT_D, _LUT_SB, _LUT_N = _build_contributions()

_M64 = (1 << 64) - 1


def make_perm(seed: int):
    """Seeded permutation tables, exactly the reference's LCG Fisher-Yates
    (Simplex.cs:180-208, C# signed-64-bit wrapping semantics)."""

    def step(s):
        return (s * 6364136223846793005 + 1442695040888963407) & _M64

    def signed(s):
        return s - (1 << 64) if s >= (1 << 63) else s

    perm = np.zeros(256, np.int64)
    perm3d = np.zeros(256, np.int64)
    source = np.arange(256, dtype=np.int64)
    s = seed & _M64
    for _ in range(3):
        s = step(s)
    for i in range(255, -1, -1):
        s = step(s)
        # C# % takes the dividend sign; negative remainders are fixed up
        r = int(np.fmod(signed((s + 31) & _M64), i + 1))
        if r < 0:
            r += i + 1
        perm[i] = source[r]
        perm3d[i] = (perm[i] % 24) * 3
        source[r] = source[i]
    return perm, perm3d


class OpenSimplex3D:
    """Vectorized OpenSimplex noise, numerically matching the reference
    sampler. evaluate() broadcasts over arbitrary coordinate arrays."""

    def __init__(self, seed: int = 7):
        # the reference seeds its scene noise with 7 (SampleFunctions.cs:17)
        self.perm, self.perm3d = make_perm(seed)
        self.grad_flat = GRADIENTS_3D.reshape(-1)

    def evaluate(self, x, y, z, xp=np):
        f = xp.float64 if xp is np else _jnp_float()
        i64 = xp.int64 if xp is np else _jnp_int()
        x = xp.asarray(x, f)
        y = xp.asarray(y, f)
        z = xp.asarray(z, f)
        perm = xp.asarray(self.perm, i64)
        perm3d = xp.asarray(self.perm3d, i64)
        grads = xp.asarray(GRADIENTS_3D, f)
        lut_d = xp.asarray(_LUT_D, f)
        lut_sb = xp.asarray(_LUT_SB, i64)

        stretch = (x + y + z) * STRETCH_3D
        xs, ys, zs = x + stretch, y + stretch, z + stretch
        xsb = xp.floor(xs).astype(i64)
        ysb = xp.floor(ys).astype(i64)
        zsb = xp.floor(zs).astype(i64)
        squish = (xsb + ysb + zsb).astype(f) * SQUISH_3D
        dx0 = x - (xsb.astype(f) + squish)
        dy0 = y - (ysb.astype(f) + squish)
        dz0 = z - (zsb.astype(f) + squish)
        xins, yins, zins = xs - xsb.astype(f), ys - ysb.astype(f), zs - zsb.astype(f)
        insum = xins + yins + zins

        trunc = lambda v: xp.floor(v).astype(i64)  # operands are >= 0
        h = (trunc(yins - zins + 1)
             | (trunc(xins - yins + 1) << 1)
             | (trunc(xins - zins + 1) << 2)
             | (trunc(insum) << 3)
             | (trunc(insum + zins) << 5)
             | (trunc(insum + yins) << 7)
             | (trunc(insum + xins) << 9))

        value = xp.zeros_like(x)
        for j in range(MAX_CHAIN):
            cd = xp.take(lut_d[:, j, :], h, axis=0)       # (..., 3)
            csb = xp.take(lut_sb[:, j, :], h, axis=0)
            dx = dx0 + cd[..., 0]
            dy = dy0 + cd[..., 1]
            dz = dz0 + cd[..., 2]
            attn = 2.0 - dx * dx - dy * dy - dz * dz
            live = attn > 0
            px = (xsb + csb[..., 0]) & 0xFF
            py = (ysb + csb[..., 1])
            pz = (zsb + csb[..., 2])
            gi = xp.take(perm3d,
                         (xp.take(perm, (xp.take(perm, px) + py) & 0xFF)
                          + pz) & 0xFF)
            gx = xp.take(grads.reshape(-1), gi)
            gy = xp.take(grads.reshape(-1), gi + 1)
            gz = xp.take(grads.reshape(-1), gi + 2)
            part = gx * dx + gy * dy + gz * dz
            a2 = xp.where(live, attn, 0.0)
            a2 = a2 * a2
            value = value + a2 * a2 * part
        return value * NORM_3D


def _jnp_float():
    import jax
    return np.float64 if jax.config.read("jax_enable_x64") else np.float32


def _jnp_int():
    import jax
    return np.int64 if jax.config.read("jax_enable_x64") else np.int32


# Certified Lipschitz bound of evaluate(): per contribution,
# |grad(attn^4 (g.d))| <= |g| (2-r^2)^3 (2+7r^2) <= 12.37 * 20.2 (max at
# r^2 = 2/7), times MAX_CHAIN overlapping contributions, times NORM_3D.
OPENSIMPLEX3_LIPSCHITZ = float(np.sqrt(153.0) * 20.2 * MAX_CHAIN * NORM_3D)
