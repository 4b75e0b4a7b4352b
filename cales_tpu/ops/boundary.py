"""Functional ghost-cell layer.

TPU-native counterpart of the reference halo/BC machinery
(/root/reference/src/bound.f90): fields are stored interior-only with shape
(nz, ny, nx); each operation that needs neighbors consumes a *padded* view
(nz+2, ny+2, nx+2) materialized here according to the BC semantics of
``set_bc`` (bound.f90:202-399).  Periodic wraps become XLA collective-permutes
automatically when the array is sharded (the analogue of
updthalo/cudecompUpdateHalos, bound.f90:619-723).

Staggered-grid conventions (padded python index p == reference Fortran index p
in its 0:n+1 arrays):
  * cell-centered fields: ghost at 0 and n+1;
  * a velocity's normal direction is face-staggered: the interior includes the
    upper wall face (Fortran n); the lower wall face (Fortran 0) sits in the
    ghost slot.  For non-periodic normal BCs its value is part of the solver
    state (the ``vlo`` planes) so the corrector's update of wall-face velocity
    persists exactly as in the reference (correc.f90:45-67 + impose_norm_bc,
    bound.f90:54-100).

BC values are 2D planes with padded transverse shapes like the reference's
``type(bound)`` arrays (typedef.f90:9-13, main.f90:176-208):
  x-faces: (nz+2, ny+2);  y-faces: (nz+2, nx+2);  z-faces: (ny+2, nx+2).
"""
from __future__ import annotations

import jax.numpy as jnp

AX = {'x': 2, 'y': 1, 'z': 0}  # logical direction -> array axis of (z, y, x)


def bc_plane_shapes(ng):
    nx, ny, nz = ng
    return {'x': (nz + 2, ny + 2), 'y': (nz + 2, nx + 2), 'z': (ny + 2, nx + 2)}


def make_bc_values(ng, vals, dtype):
    """Per-face BC-value planes from namelist scalars (initbc,
    bound.f90:764-795)."""
    shapes = bc_plane_shapes(ng)
    out = []
    for idir, key in ((0, 'x'), (1, 'y'), (2, 'z')):
        out.append(tuple(jnp.full(shapes[key], vals[idir][ib], dtype=dtype)
                         for ib in range(2)))
    return tuple(out)


def _slice_axis(p, axis, i):
    idx = [slice(None)] * p.ndim
    idx[axis] = i
    return p[tuple(idx)]


def _cat(lo, body, hi, axis):
    return jnp.concatenate(
        [jnp.expand_dims(lo, axis), body, jnp.expand_dims(hi, axis)], axis=axis)


def _replace_last(p, axis, plane):
    n = p.shape[axis]
    idx = [slice(None)] * p.ndim
    idx[axis] = n - 1
    return p.at[tuple(idx)].set(plane)


def crop_bc(plane, p_shape, axis):
    """Crop a full padded-transverse BC plane to the current (partially
    padded) transverse shape of p.  The sweep pads x, then y, then z, so
    earlier-axis ghosts already exist when later axes are processed."""
    dims = [d for d in range(3) if d != axis]
    sl = []
    for d_plane, d_arr in enumerate(dims):
        cur, full = p_shape[d_arr], plane.shape[d_plane]
        if cur == full:
            sl.append(slice(None))
        elif cur == full - 2:
            sl.append(slice(1, -1))
        else:
            raise ValueError(f'BC plane shape {plane.shape} vs field {p_shape}')
    return plane[tuple(sl)]


def pad_centered(p, axis, letters, bcvals, dr):
    """One ghost layer along `axis` for a cell-centered variable
    (set_bc centered=.true., bound.f90:232-352)."""
    if letters[0] == 'P':
        return _cat(_slice_axis(p, axis, -1), p, _slice_axis(p, axis, 0), axis)
    first = _slice_axis(p, axis, 0)
    last = _slice_axis(p, axis, -1)
    lo = 2.0 * bcvals[0] - first if letters[0] == 'D' else -dr[0] * bcvals[0] + first
    hi = 2.0 * bcvals[1] - last if letters[1] == 'D' else dr[1] * bcvals[1] + last
    return _cat(lo, p, hi, axis)


def pad_face(p, axis, letters, bcvals, dr, lo_keep=None, keep=False):
    """One ghost layer along `axis` for the face-staggered normal component
    (set_bc centered=.false., bound.f90:283-318 'D', 354-396 'N').

    keep=True (the corrector path, impose_norm_bc=.false.): the lower wall
    face comes from `lo_keep` and the interior wall-face entry is NOT
    overwritten — the corrected values persist."""
    if letters[0] == 'P':
        return _cat(_slice_axis(p, axis, -1), p, _slice_axis(p, axis, 0), axis)
    first = _slice_axis(p, axis, 0)
    second_last = _slice_axis(p, axis, -2)
    last = _slice_axis(p, axis, -1)
    if keep:
        lo = lo_keep
        hi = second_last if letters[1] == 'D' else last
        return _cat(lo, p, hi, axis)
    lo = bcvals[0] if letters[0] == 'D' else -dr[0] * bcvals[0] + first
    if letters[1] == 'D':
        # u(n) = bc; u(n+1) = u(n-1) (unused)   bound.f90:292-293
        body = _replace_last(p, axis, bcvals[1])
        hi = second_last
    else:
        # u(n) = dr*bc + u(n-1); u(n+1) = old u(n) (unused)  bound.f90:365-366
        body = _replace_last(p, axis, dr[1] * bcvals[1] + second_last)
        hi = last
    return _cat(lo, body, hi, axis)


def pad_scalar(p, cbc, bcvals, dl, dzc):
    """Ghost fill for a cell-centered scalar (boundp, bound.f90:156-200)."""
    nz = p.shape[0]
    drs = {'x': (dl[0], dl[0]), 'y': (dl[1], dl[1]),
           'z': (float(dzc[0]), float(dzc[nz]))}
    for key, idir in (('x', 0), ('y', 1), ('z', 2)):
        axis = AX[key]
        bv = tuple(crop_bc(bcvals[idir][ib], p.shape, axis) for ib in range(2))
        p = pad_centered(p, axis, cbc[idir], bv, drs[key])
    return p


def pad_velocity(u, v, w, cbcvel, bcu, bcv, bcw, dl, dzc, dzf,
                 vlo=None, is_correc=False):
    """Ghost fill for the staggered velocity (bounduvw, bound.f90:18-154).

    cbcvel[ibound][idir][ivel]; bcu/bcv/bcw: per-direction plane pairs
    (Neumann values possibly wall-model-updated).  vlo: (u_lo, v_lo, w_lo)
    lower-wall normal-face planes from the state; consumed when is_correc
    (impose_norm_bc=.false., bound.f90:54-56).

    Returns (up, vp, wp, vlo_new) with vlo_new the planes actually placed in
    the ghost layer (full padded transverse shape), to be stored back.
    """
    nz = u.shape[0]
    dr_par = {'x': (dl[0], dl[0]), 'y': (dl[1], dl[1]),
              'z': (float(dzc[0]), float(dzc[nz]))}
    dr_nrm = {'x': (dl[0], dl[0]), 'y': (dl[1], dl[1]),
              'z': (float(dzf[0]), float(dzf[nz]))}

    fields = {'u': u, 'v': v, 'w': w}
    bcs = {'u': bcu, 'v': bcv, 'w': bcw}
    face_of = {'u': 'x', 'v': 'y', 'w': 'z'}
    vlo_in = {'u': None, 'v': None, 'w': None}
    if vlo is not None:
        vlo_in = {'u': vlo[0], 'v': vlo[1], 'w': vlo[2]}

    out = {}
    for name, ivel in (('u', 0), ('v', 1), ('w', 2)):
        p = fields[name]
        for key, idir in (('x', 0), ('y', 1), ('z', 2)):
            axis = AX[key]
            lts = (cbcvel[0][idir][ivel], cbcvel[1][idir][ivel])
            bv = tuple(crop_bc(bcs[name][idir][ib], p.shape, axis)
                       for ib in range(2))
            if key == face_of[name]:
                keep = is_correc and lts[0] != 'P' and vlo_in[name] is not None
                lo_keep = (crop_bc(vlo_in[name], p.shape, axis)
                           if keep else None)
                p = pad_face(p, axis, lts, bv, dr_nrm[key],
                             lo_keep=lo_keep, keep=keep)
            else:
                p = pad_centered(p, axis, lts, bv, dr_par[key])
        out[name] = p

    vlo_new = (out['u'][:, :, 0], out['v'][:, 0, :], out['w'][0, :, :])
    return out['u'], out['v'], out['w'], vlo_new
