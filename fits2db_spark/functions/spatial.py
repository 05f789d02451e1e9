"""Spatial index columns from (ra, dec): HEALPix ring/nest pixel ids and HTM
trixel ids — the Data Lab load-time convention the reference computes for
every catalog (SURVEY.md §1.1 derived columns: ring256, nest4096, htm9,
random_id).

Implementations are the PUBLIC algorithms, vectorized numpy:
* HEALPix ang2pix (ring + nested), Gorski et al. 2005 (the reference
  pseudocode in the HEALPix primer), power-of-two nside;
* HTM (Hierarchical Triangular Mesh), Szalay et al. 2007: octahedron root
  triangles subdivided by edge midpoints, 2 bits per level.

Exposed to Spark as Arrow-batched pandas UDFs (fits2db_spark.operators.etl
spatial_cols) — numpy math per batch, no per-row Python.
"""

from __future__ import annotations

import numpy as np

TWO_THIRDS = 2.0 / 3.0


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits (for nested pixel xy -> z-order)."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def ang2pix_nest(nside: int, ra_deg: np.ndarray, dec_deg: np.ndarray) -> np.ndarray:
    """HEALPix nested-scheme pixel index for power-of-two nside."""
    if nside & (nside - 1):
        raise ValueError("nside must be a power of two for the nested scheme")
    theta = np.radians(90.0 - np.asarray(dec_deg, dtype="f8"))
    phi = np.radians(np.asarray(ra_deg, dtype="f8") % 360.0)
    z = np.cos(theta)
    za = np.abs(z)
    tt = (phi / (np.pi / 2.0)) % 4.0

    ix = np.empty(z.shape, dtype=np.int64)
    iy = np.empty(z.shape, dtype=np.int64)
    face = np.empty(z.shape, dtype=np.int64)

    eq = za <= TWO_THIRDS
    # --- equatorial region
    temp1 = nside * (0.5 + tt[eq])
    temp2 = nside * z[eq] * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)  # ascending edge line
    jm = np.floor(temp1 + temp2).astype(np.int64)  # descending edge line
    ifp = jp >> int(np.log2(nside))
    ifm = jm >> int(np.log2(nside))
    f = np.where(ifp == ifm, (ifp & 3) + 4, np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8))
    face[eq] = f
    ix[eq] = jm & (nside - 1)
    iy[eq] = nside - (jp & (nside - 1)) - 1

    # --- polar caps
    po = ~eq
    ntt = np.minimum(3, np.floor(tt[po]).astype(np.int64))
    tp = tt[po] - ntt
    tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
    jp = np.floor(tp * tmp).astype(np.int64)
    jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
    jp = np.minimum(jp, nside - 1)
    jm = np.minimum(jm, nside - 1)
    north = z[po] >= 0
    face[po] = np.where(north, ntt, ntt + 8)
    ix[po] = np.where(north, nside - jm - 1, jp)
    iy[po] = np.where(north, nside - jp - 1, jm)

    return face * nside * nside + (_spread_bits(ix) | (_spread_bits(iy) << 1))


def ang2pix_ring(nside: int, ra_deg: np.ndarray, dec_deg: np.ndarray) -> np.ndarray:
    """HEALPix ring-scheme pixel index."""
    theta = np.radians(90.0 - np.asarray(dec_deg, dtype="f8"))
    phi = np.radians(np.asarray(ra_deg, dtype="f8") % 360.0)
    z = np.cos(theta)
    za = np.abs(z)
    tt = (phi / (np.pi / 2.0)) % 4.0
    pix = np.empty(z.shape, dtype=np.int64)

    eq = za <= TWO_THIRDS
    temp1 = nside * (0.5 + tt[eq])
    temp2 = nside * z[eq] * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)
    jm = np.floor(temp1 + temp2).astype(np.int64)
    ir = nside + 1 + jp - jm  # ring counter within equatorial belt
    kshift = 1 - (ir & 1)
    ip = (jp + jm - nside + kshift + 1) // 2
    ip = ip % (4 * nside)
    pix[eq] = 2 * nside * (nside - 1) + (ir - 1) * 4 * nside + ip

    po = ~eq
    tp = tt[po] - np.floor(tt[po])
    tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
    jp = np.floor(tp * tmp).astype(np.int64)
    jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir = jp + jm + 1
    ip = np.floor(tt[po] * ir).astype(np.int64)
    ip = ip % (4 * ir)
    north_pix = 2 * ir * (ir - 1) + ip
    south_pix = 12 * nside * nside - 2 * ir * (ir + 1) + ip
    pix[po] = np.where(z[po] > 0, north_pix, south_pix)
    return pix


# --- HTM -------------------------------------------------------------------

_HTM_V = np.array(
    [
        [0.0, 0.0, 1.0],   # v0: north pole
        [1.0, 0.0, 0.0],   # v1
        [0.0, 1.0, 0.0],   # v2
        [-1.0, 0.0, 0.0],  # v3
        [0.0, -1.0, 0.0],  # v4
        [0.0, 0.0, -1.0],  # v5: south pole
    ]
)

# (root id, corner indexes) — public HTM start triangles
_HTM_ROOTS = [
    (8, (1, 5, 2)),   # S0
    (9, (2, 5, 3)),   # S1
    (10, (3, 5, 4)),  # S2
    (11, (4, 5, 1)),  # S3
    (12, (1, 0, 4)),  # N0
    (13, (4, 0, 3)),  # N1
    (14, (3, 0, 2)),  # N2
    (15, (2, 0, 1)),  # N3
]


def _inside(v0, v1, v2, p, eps=-1e-12):
    """point-in-spherical-triangle: all edge-plane tests non-negative."""
    return (
        (np.einsum("ij,ij->i", np.cross(v0, v1), p) >= eps)
        & (np.einsum("ij,ij->i", np.cross(v1, v2), p) >= eps)
        & (np.einsum("ij,ij->i", np.cross(v2, v0), p) >= eps)
    )


def radec_to_htm(level: int, ra_deg: np.ndarray, dec_deg: np.ndarray) -> np.ndarray:
    """HTM trixel id at the given level (level 9 -> 'htm9')."""
    ra = np.radians(np.asarray(ra_deg, dtype="f8") % 360.0)
    dec = np.radians(np.asarray(dec_deg, dtype="f8"))
    p = np.stack(
        [np.cos(dec) * np.cos(ra), np.cos(dec) * np.sin(ra), np.sin(dec)], axis=1
    )
    n = len(p)
    ids = np.zeros(n, dtype=np.int64)
    tri = np.zeros((n, 3, 3), dtype="f8")
    assigned = np.zeros(n, dtype=bool)
    for root_id, (a, b, c) in _HTM_ROOTS:
        m = ~assigned & _inside(
            np.broadcast_to(_HTM_V[a], (n, 3)),
            np.broadcast_to(_HTM_V[b], (n, 3)),
            np.broadcast_to(_HTM_V[c], (n, 3)),
            p,
        )
        ids[m] = root_id
        tri[m] = _HTM_V[[a, b, c]]
        assigned |= m
    # numerical stragglers on edges: assign to first root
    if not assigned.all():
        m = ~assigned
        ids[m] = _HTM_ROOTS[0][0]
        tri[m] = _HTM_V[[1, 5, 2]]

    for _ in range(level):
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        w0 = v1 + v2
        w0 /= np.linalg.norm(w0, axis=1, keepdims=True)
        w1 = v0 + v2
        w1 /= np.linalg.norm(w1, axis=1, keepdims=True)
        w2 = v0 + v1
        w2 /= np.linalg.norm(w2, axis=1, keepdims=True)
        child = np.full(n, 3, dtype=np.int64)  # default: center triangle
        new_tri = np.stack([w0, w1, w2], axis=1)
        for k, (a, b, c) in enumerate(((v0, w2, w1), (v1, w0, w2), (v2, w1, w0))):
            m = (child == 3) & _inside(a, b, c, p)
            child[m] = k
            new_tri[m] = np.stack([a[m], b[m], c[m]], axis=1)
        ids = ids * 4 + child
        tri = new_tri
    return ids
