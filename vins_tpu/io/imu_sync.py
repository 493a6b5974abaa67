"""Accel/gyro stream alignment and IMU↔image measurement batching.

The reference receives accelerometer and gyroscope callbacks on separate
queues at ~100 Hz and linearly interpolates acceleration to each gyro
timestamp before pushing a fused sample (ViewController.mm:1020-1173,
interpolation at :1081-1095). It then aligns IMU batches to image
timestamps in getMeasurements (ViewController.mm:604-638): every image
consumes all IMU samples up to its stamp.

Host-side preprocessing — vectorized numpy, runs once per dataset/stream,
so no device kernel is warranted.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..core.preintegration import ImuChunk


def interpolate_imu(t_gyro: np.ndarray, gyro: np.ndarray,
                    t_accel: np.ndarray, accel: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fuse async accel/gyro streams at the gyro timestamps.

    Linear interpolation of accel to each gyro stamp; gyro samples
    outside the accel time span are dropped (the reference's callback
    buffers equally wait for an accel sample on each side,
    ViewController.mm:1062-1101).

    Returns (t [N], accel [N,3], gyro [N,3]), strictly increasing t.
    """
    t_gyro = np.asarray(t_gyro, np.float64)
    t_accel = np.asarray(t_accel, np.float64)
    gyro = np.asarray(gyro, np.float64)
    accel = np.asarray(accel, np.float64)
    keep = (t_gyro >= t_accel[0]) & (t_gyro <= t_accel[-1])
    t = t_gyro[keep]
    g = gyro[keep]
    a = np.stack([np.interp(t, t_accel, accel[:, i]) for i in range(3)],
                 axis=1)
    order = np.argsort(t, kind="stable")
    t, a, g = t[order], a[order], g[order]
    uniq = np.concatenate([[True], np.diff(t) > 0])
    return t[uniq], a[uniq], g[uniq]


def align_measurements(t_imu: np.ndarray, t_img: np.ndarray
                       ) -> List[Tuple[int, int]]:
    """Per-image IMU sample ranges — getMeasurements equivalent
    (ViewController.mm:604-638).

    Returns for each image k a half-open index range [lo, hi) into the
    IMU stream: all samples with t_img[k-1] < t <= t_img[k]. Images
    before the first IMU sample get empty ranges.
    """
    t_imu = np.asarray(t_imu, np.float64)
    t_img = np.asarray(t_img, np.float64)
    his = np.searchsorted(t_imu, t_img, side="right")
    ranges = []
    lo = 0
    for hi in his:
        ranges.append((lo, int(hi)))
        lo = int(hi)
    return ranges


def chunk_imu(t_imu: np.ndarray, accel: np.ndarray, gyro: np.ndarray,
              t_img: np.ndarray, max_per_edge: int) -> ImuChunk:
    """Pack per-image IMU ranges into stacked fixed-size `ImuChunk`s.

    Returns an ImuChunk pytree of stacked arrays — dt [F, M],
    acc/gyr [F, M, 3] with F = len(t_img) and M = max_per_edge — in the
    estimator's native format (core/preintegration.py:35): row 0 of each
    edge is the seed sample at the previous image stamp (dt = 0, the
    reference's acc_0/gyr_0), rows 1..k are integration steps, padding
    rows have dt = 0 so the scan ignores them. dt bookkeeping matches
    send_imu (ViewController.mm:661-681): the first step spans from the
    previous image stamp, the last sub-interval extends to the image
    stamp itself (zero-order hold). Overflowing samples accumulate dt
    into the final slot so total integration time is conserved.
    """
    t_imu = np.asarray(t_imu, np.float64)
    F = len(t_img)
    M = max_per_edge
    dt = np.zeros((F, M), np.float32)
    acc = np.zeros((F, M, 3), np.float32)
    gyr = np.zeros((F, M, 3), np.float32)
    ranges = align_measurements(t_imu, t_img)
    for k, (lo, hi) in enumerate(ranges):
        if hi <= lo:
            continue
        t_prev = t_img[k - 1] if k > 0 else t_imu[lo]
        # Row 0: seed sample held at the previous frame time.
        seed = max(lo - 1, 0) if k > 0 else lo
        acc[k, 0] = accel[seed]
        gyr[k, 0] = gyro[seed]
        j = 1
        for i in range(lo, hi):
            d = t_imu[i] - t_prev
            t_prev = t_imu[i]
            if d < 0:
                continue
            if j >= M:
                dt[k, M - 1] += d
                acc[k, M - 1] = accel[i]
                gyr[k, M - 1] = gyro[i]
                continue
            dt[k, j] = d
            acc[k, j] = accel[i]
            gyr[k, j] = gyro[i]
            j += 1
        # Tail sub-interval up to the image stamp (zero-order hold).
        tail = t_img[k] - t_prev
        if tail > 1e-9:
            if j < M:
                dt[k, j] = tail
                acc[k, j] = acc[k, j - 1]
                gyr[k, j] = gyr[k, j - 1]
            else:
                dt[k, M - 1] += tail
    return ImuChunk(dt=dt, acc=acc, gyr=gyr)
