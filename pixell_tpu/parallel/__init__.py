"""Multi-chip distribution: meshes, collectives, sharded transforms.

Replaces the reference's MPI layer (pixell/mpi.py, utils.allreduce/allgather,
tilemap.redistribute) with jax.sharding over device meshes: collectives ride
the ICI instead of MPI messages, and "redistribution" is just resharding.
"""
from . import mesh, dist, sht_dist
from .mesh import get_mesh, local_mesh
from .dist import FakeCommunicator, COMM_WORLD, COMM_SELF, allreduce, allgather
