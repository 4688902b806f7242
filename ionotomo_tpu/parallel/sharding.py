"""Multi-chip execution: ray-axis sharding over a device mesh.

Design (SURVEY.md §2.1–2.2, §5.7–5.8): the reference's dask fan-out over
ray chunks becomes single-program SPMD — a 1-D mesh over the ray axis, the
voxel grid **replicated** (256³ f32 = 64 MiB fits every chip), rays sharded.
The only cross-chip traffic in the inner loop is the psum of adjoint/
gradient contributions and CG inner products, riding ICI. Kept deliberately
thin: these helpers build meshes/shardings; solver code stays sharding-
agnostic because XLA's SPMD partitioner propagates the annotations through
jit (gather stays local to the replicated grid; the vjp scatter-add
all-reduces automatically).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
SLICE_AXIS = "slice"


def ray_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'rays'."""
    devices = devices if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (RAY_AXIS,), devices=devices)


def multislice_ray_mesh(n_slices: int, chips_per_slice: int = None,
                        devices=None) -> Mesh:
    """2-level ('slice', 'rays') mesh for multi-slice deployments: chips
    within a slice talk over ICI, slices over DCN. Rays shard over the
    flattened slice×chip product (``ray_sharding`` handles both mesh
    kinds), so the device order must put each slice's chips contiguously
    — jax's default device order does on real multi-slice topologies.
    The only DCN traffic in a solve is the grid-sized psum of adjoint
    contributions and the scalar CG reductions, once per CG iteration
    (64 MiB per 256³ f32 grid); XLA's hierarchical collectives reduce
    within slices over ICI first.
    """
    devices = list(devices if devices is not None else jax.devices())
    if chips_per_slice is None:
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices do not divide into {n_slices} "
                "slices; pass chips_per_slice (and an explicit device "
                "subset) to use fewer devices deliberately")
        chips_per_slice = len(devices) // n_slices
    n = n_slices * chips_per_slice
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return jax.make_mesh((n_slices, chips_per_slice),
                         (SLICE_AXIS, RAY_AXIS), devices=devices[:n])


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis — over the slice×chip product when the
    mesh is 2-level (multislice_ray_mesh)."""
    if SLICE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((SLICE_AXIS, RAY_AXIS)))
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


MEMBER_AXIS = "members"


def member_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'members' — the
    EnKF's per-realization (P3) parallelism across chips: each device
    carries n_members/n_devices members end-to-end (advect + anchor +
    Krylov member update all member-local); the only cross-chip traffic
    is the grid-sized ensemble mean/std psum once per step and the
    scalar reductions of the shared wind refinement. Near-linear scaling
    when n_members % n_devices == 0 (required — members are not padded:
    a phantom member would bias the ensemble mean)."""
    devices = devices if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (MEMBER_AXIS,), devices=devices)


def member_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (member) axis of an (n_members, *grid) ensemble."""
    return NamedSharding(mesh, P(MEMBER_AXIS))


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def shard_ray_batch(mesh: Mesh, *arrays):
    """Pad the leading axis to a multiple of the mesh size and place each
    array with the ray axis sharded. Returns (padded arrays, valid_count).

    Padding replicates the last element so padded rays are valid geometry
    (their results are sliced away / masked by the caller).
    """
    nd = mesh.devices.size
    out = []
    n = arrays[0].shape[0]
    n_pad = pad_to_multiple(n, nd)
    sh = ray_sharding(mesh)
    for a in arrays:
        if n_pad != n:
            pad = jnp.broadcast_to(a[-1:], (n_pad - n,) + a.shape[1:])
            a = jnp.concatenate([a, pad], axis=0)
        out.append(jax.device_put(a, sh))
    return out, n


def replicate(mesh: Mesh, *arrays):
    """Place arrays fully replicated on the mesh."""
    sh = replicated(mesh)
    return [jax.device_put(a, sh) for a in arrays]
