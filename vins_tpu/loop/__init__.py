"""Loop closure / global SLAM layer.

Functional equivalents of the reference's loop stack (SURVEY.md §2.1):
KeyFrame/KeyFrameDatabase (loop/keyframe.{h,cpp}, keyfame_database.{h,cpp}),
the DBoW2-based detector (loop/TemplatedLoopDetector.h), and the 4-DoF
pose-graph optimizer (keyfame_database.cpp:140-356) — re-designed as
fixed-capacity device arrays scored with one matvec, batched Hamming
geometric verification, and a jitted LM pose-graph solve.
"""
from .keyframe_db import KeyframeDB, LoopCloser, LoopHit
from .pose_graph import PoseGraph, optimize_pose_graph, drift_from_solution
from .vocabulary import (Vocabulary, load_vocabulary, save_vocabulary,
                         score_database, train_vocabulary, transform)

__all__ = ["KeyframeDB", "LoopCloser", "LoopHit", "PoseGraph",
           "optimize_pose_graph", "drift_from_solution", "Vocabulary",
           "train_vocabulary", "transform", "score_database",
           "save_vocabulary", "load_vocabulary"]
