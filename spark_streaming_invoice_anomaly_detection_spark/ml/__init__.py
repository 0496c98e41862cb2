"""Clustering-based anomaly detection (SURVEY.md §2.6 M1-M7)."""

from .clustering import (
    assemble_features,
    compute_threshold,
    detect_anomalies,
    distance_to_centroid,
    elbow_selection,
    load_detector,
    save_detector,
    train_detector,
    train_sweep,
)

__all__ = [
    "assemble_features",
    "compute_threshold",
    "detect_anomalies",
    "distance_to_centroid",
    "elbow_selection",
    "load_detector",
    "save_detector",
    "train_detector",
    "train_sweep",
]
