"""DeepPointMap-TPU: a TPU-native neural LiDAR SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of DeepPointMap
(AAAI 2024, reference implementation: ZhangXiaze/DeepPointMap). The compute
path (descriptor extraction, registration, loop scoring) is expressed as
jit-compiled fixed-shape functions over padded point sets; the SLAM state
machine (pose graph, keyframing, loop closure, global optimization) runs
host-side in NumPy.

Layout:
    config        -- CLI + YAML configuration (yaml-over-cli priority)
    utils         -- SE3 math, logging
    data          -- file readers, preprocessing, datasets
    ops           -- point-cloud kernels (FPS, kNN, grouping, Kabsch, ...)
    models        -- encoder / decoder / loss (Flax) + torch weight converter
    slam          -- pose graph, SLAM modules, pose-graph optimizer, recorder
    parallel      -- device mesh + sharded training step
    pipeline      -- entry points (infer / train / multi-agent)
"""

__version__ = "0.1.0"
