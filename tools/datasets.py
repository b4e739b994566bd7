"""Procedurally-generated LABELED datasets for real-weight accuracy gates.

This environment has zero egress (no MNIST/CIFAR downloads), so the
"real data" for trained-weight gates is procedural: images whose label is
determined by construction, rendered with enough augmentation variance
that a classifier must genuinely learn the task.  What the gates then
measure is TASK accuracy of trained weights under quantization — the
evidence class the reference pins with its real-weight assertions
(reference: integrity_test.py:108 GoogLeNet top-1==338;
:133-152 SSD golden record) — rather than synthetic-weight
self-agreement.

Datasets:
  * digits (28×28 mono)  — the mnist_train.py renderer (cv2 Hershey fonts
    × shear/rotation/elastic/thickness/noise), re-exported here.
  * shapes10 (32×32 RGB) — 10 geometric classes (circle, square,
    triangle, 5-star, plus, ring, h-stripes, v-stripes, checker,
    diamond) with random colors/position/scale/rotation/noise/blur —
    the CIFAR-scale classification task.
  * shapes_det (96×96 RGB) — 1..3 non-overlapping shapes from 4 classes
    per image with ground-truth boxes — the toy-detector mAP task.

Everything is deterministic in (seed, n); eval sets use a disjoint seed
from training so the gate measures generalization, not memorization.
"""

from __future__ import annotations

import numpy as np

SHAPE_CLASSES = [
    "circle", "square", "triangle", "star", "plus",
    "ring", "hstripes", "vstripes", "checker", "diamond",
]


def _colors(rng):
    """(fg, bg) BGR uint8 colors with guaranteed contrast."""
    while True:
        fg = rng.integers(0, 256, 3)
        bg = rng.integers(0, 256, 3)
        if np.abs(fg.astype(int) - bg.astype(int)).sum() > 180:
            return tuple(int(c) for c in fg), tuple(int(c) for c in bg)


def _poly(cx, cy, r, n_vertices, rot, star=False):
    """Regular polygon (or 5-star) vertex array for cv2.fillPoly."""
    pts = []
    n = n_vertices * (2 if star else 1)
    for i in range(n):
        rad = r if (not star or i % 2 == 0) else r * 0.45
        a = rot + 2 * np.pi * i / n
        pts.append([cx + rad * np.cos(a), cy + rad * np.sin(a)])
    return np.asarray([pts], np.int32)


def render_shape(rng: np.random.Generator, cls: int, size: int = 32,
                 canvas=None, region=None):
    """One `size`×`size` BGR image of SHAPE_CLASSES[cls]; returns
    (image float32 0-255 CHW, (x0, y0, x1, y1) box).  With `canvas`,
    draws into the given HxWx3 uint8 array inside `region` instead."""
    import cv2

    fg, bg = _colors(rng)
    if canvas is None:
        img = np.full((size, size, 3), bg, np.uint8)
        rx0, ry0, rx1, ry1 = 0, 0, size, size
    else:
        img = canvas
        rx0, ry0, rx1, ry1 = region
    side = min(rx1 - rx0, ry1 - ry0)
    r = int(side * rng.uniform(0.28, 0.42))
    cx = int(rng.uniform(rx0 + r + 1, rx1 - r - 1))
    cy = int(rng.uniform(ry0 + r + 1, ry1 - r - 1))
    rot = float(rng.uniform(0, 2 * np.pi))
    name = SHAPE_CLASSES[cls]

    if name == "circle":
        cv2.circle(img, (cx, cy), r, fg, -1, cv2.LINE_AA)
    elif name == "square":
        cv2.fillPoly(img, _poly(cx, cy, r, 4, rot + np.pi / 4), fg,
                     cv2.LINE_AA)
    elif name == "triangle":
        cv2.fillPoly(img, _poly(cx, cy, r, 3, rot), fg, cv2.LINE_AA)
    elif name == "star":
        cv2.fillPoly(img, _poly(cx, cy, r, 5, rot, star=True), fg,
                     cv2.LINE_AA)
    elif name == "plus":
        t = max(2, int(r * 0.38))
        cv2.rectangle(img, (cx - r, cy - t), (cx + r, cy + t), fg, -1)
        cv2.rectangle(img, (cx - t, cy - r), (cx + t, cy + r), fg, -1)
    elif name == "ring":
        cv2.circle(img, (cx, cy), r, fg, max(2, int(r * 0.38)), cv2.LINE_AA)
    elif name == "hstripes":
        step = max(3, r // 2)
        for y in range(cy - r, cy + r, step):
            cv2.rectangle(img, (cx - r, y), (cx + r, y + step // 2), fg, -1)
    elif name == "vstripes":
        step = max(3, r // 2)
        for x in range(cx - r, cx + r, step):
            cv2.rectangle(img, (x, cy - r), (x + step // 2, cy + r), fg, -1)
    elif name == "checker":
        step = max(3, (2 * r) // 3)
        for i, y in enumerate(range(cy - r, cy + r, step)):
            for j, x in enumerate(range(cx - r, cx + r, step)):
                if (i + j) % 2 == 0:
                    cv2.rectangle(img, (x, y), (x + step, y + step), fg, -1)
    elif name == "diamond":
        cv2.fillPoly(img, _poly(cx, cy, r, 4, rot * 0 + np.pi / 2), fg,
                     cv2.LINE_AA)
    box = (max(rx0, cx - r), max(ry0, cy - r),
           min(rx1, cx + r), min(ry1, cy + r))
    if canvas is not None:
        return None, box

    # photometric augmentation: noise + occasional blur
    if rng.random() < 0.4:
        img = cv2.GaussianBlur(img, (3, 3), 0)
    out = img.astype(np.float32) + rng.normal(0, 6, img.shape)
    out = np.clip(out, 0, 255).transpose(2, 0, 1)  # CHW
    return out, box


def shapes10(n: int, seed: int, size: int = 32):
    """Balanced labeled set: (x (N,3,size,size) float32 0-255, y (N,))."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for i in range(n):
        cls = i % len(SHAPE_CLASSES)
        img, _ = render_shape(rng, cls, size)
        xs.append(img)
        ys.append(cls)
    x = np.stack(xs).astype(np.float32)
    y = np.asarray(ys, np.int32)
    perm = rng.permutation(n)
    return x[perm], y[perm]


def digits(n: int, seed: int):
    """Balanced labeled digit set (the mnist_train renderer):
    (x (N,1,28,28) float32 0-255, y (N,))."""
    from tools.mnist_train import render_digit

    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for i in range(n):
        d = i % 10
        xs.append(render_digit(rng, d))
        ys.append(d)
    x = np.stack(xs)[:, None, :, :].astype(np.float32)
    y = np.asarray(ys, np.int32)
    perm = rng.permutation(n)
    return x[perm], y[perm]


DET_CLASSES = SHAPE_CLASSES[:4]  # circle, square, triangle, star


def shapes_det(n: int, seed: int, size: int = 96):
    """Toy-detection set: each image has 1..3 shapes in disjoint cells.
    Returns (x (N,3,size,size) float32 0-255,
             gts: list of [(cls, (x0,y0,x1,y1) normalized)])."""
    import cv2

    rng = np.random.default_rng(seed)
    xs, gts = [], []
    cells = [  # 2×2 grid of placement cells keeps boxes disjoint
        (0, 0, size // 2, size // 2), (size // 2, 0, size, size // 2),
        (0, size // 2, size // 2, size), (size // 2, size // 2, size, size),
    ]
    for _ in range(n):
        _, bg = _colors(rng)
        canvas = np.full((size, size, 3), bg, np.uint8)
        k = int(rng.integers(1, 4))
        picks = rng.choice(len(cells), size=k, replace=False)
        recs = []
        for ci in picks:
            cls = int(rng.integers(len(DET_CLASSES)))
            _, box = render_shape(rng, cls, size, canvas=canvas,
                                  region=cells[ci])
            x0, y0, x1, y1 = box
            recs.append((cls, (x0 / size, y0 / size, x1 / size, y1 / size)))
        if rng.random() < 0.3:
            canvas = cv2.GaussianBlur(canvas, (3, 3), 0)
        img = np.clip(
            canvas.astype(np.float32) + rng.normal(0, 5, canvas.shape),
            0, 255,
        ).transpose(2, 0, 1)
        xs.append(img)
        gts.append(recs)
    return np.stack(xs).astype(np.float32), gts


def shapes224(n: int, seed: int):
    """shapes10 at the googlenet-v1 flagship resolution
    (tools/train_flagship.py)."""
    return shapes10(n, seed, size=224)


def shapes_det300(n: int, seed: int):
    """shapes_det at the ssd_mobilenet_v1 flagship resolution
    (tools/train_flagship.py)."""
    return shapes_det(n, seed, size=300)
