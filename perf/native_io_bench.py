"""Host data-path throughput: native C++ batch decode (DCT-scaled libjpeg +
thread pool) vs cv2 per-image decode+resize. Generates large synthetic
JPEGs (ImageNet-photo scale) and times both paths to a 224x224 batch."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

from simpleaicv_tpu.data import native_io

N, SRC_H, SRC_W, HW = 256, 1500, 2000, 224


def main():
    assert native_io.available(), "build csrc first: make -C csrc"
    tmp = tempfile.mkdtemp(prefix="nio_bench_")
    rng = np.random.RandomState(0)
    paths = []
    base = (rng.rand(SRC_H, SRC_W, 3) * 255).astype(np.uint8)
    base = cv2.GaussianBlur(base, (31, 31), 8)  # photo-like compressibility
    for i in range(N):
        p = os.path.join(tmp, f"{i}.jpg")
        if i == 0:
            cv2.imwrite(p, base, [cv2.IMWRITE_JPEG_QUALITY, 90])
        else:
            os.link(paths[0], p)
        paths.append(p)

    t0 = time.perf_counter()
    batch = native_io.batch_decode_files(paths, HW, n_threads=8)
    dt_native = time.perf_counter() - t0
    assert batch.shape == (N, HW, HW, 3)

    t0 = time.perf_counter()
    out = np.empty((N, HW, HW, 3), np.float32)
    for i, p in enumerate(paths):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        s = min(HW / img.shape[0], HW / img.shape[1])
        rh, rw = round(img.shape[0] * s), round(img.shape[1] * s)
        r = cv2.resize(img, (rw, rh)).astype(np.float32)
        out[i] = 0
        out[i, :rh, :rw] = r
    dt_cv2 = time.perf_counter() - t0

    print(f"native batch (8 threads): {N/dt_native:.0f} img/s "
          f"({dt_native*1000/N:.2f} ms/img)")
    print(f"cv2 single-thread loop:   {N/dt_cv2:.0f} img/s "
          f"({dt_cv2*1000/N:.2f} ms/img)")
    print(f"speedup: {dt_cv2/dt_native:.1f}x")


if __name__ == "__main__":
    main()
