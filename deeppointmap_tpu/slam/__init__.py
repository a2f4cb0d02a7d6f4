"""Host-side SLAM state machine.

The classical-robotics control flow of the reference (reference:
system/core.py, system/modules/*) wrapped around three jit-compiled
network entry points: descriptor extraction, pairwise registration and
loop scoring. Pose bookkeeping is NumPy float64; the pose-graph backend
is our own Gauss-Newton/LM solver (slam/optimizer.py) replacing the
reference's Open3D C++ dependency.
"""
