"""SLAM/SfM model layers: descriptors, matching, pose graph, bundle adjustment."""
