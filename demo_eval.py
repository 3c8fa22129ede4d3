"""Evaluate the demo-trained flagship model end-to-end on the TPU.

Run after demo training (see demo_logs/): reports
- cross-entropy bpsp on held-out images (tester path)
- REAL file bpsp via encode->decode->bit-exact (write_to_files path)
- PNG comparison on the same images
- single-image + batch codec timings with the trained (sharp) model
"""
import glob
import os
import sys
import time

import numpy as np
from PIL import Image


def main():
    from l3c_tpu.codec import make_bitcoding
    from l3c_tpu.data.images import Testset, load_image_uint8
    from l3c_tpu.eval.tester import MultiscaleTester

    log_dir = sorted(glob.glob("demo_logs/*demo"))[-1]
    print(f"log dir: {log_dir}")
    tester = MultiscaleTester.from_log_dir(
        log_dir, ["l3c_tpu/configs"], use_cache=False)
    print(f"restored itr {tester.restore_itr}")

    ts = Testset("demo_data/val", max_imgs=8)

    # 1. cross-entropy bpsp
    res = tester.test(ts)
    print(f"theory bpsp over {len(ts)} val images: {res.mean_bpsp():.4f}")

    # 2. real codec round-trip
    out_dir = "demo_logs/encoded"
    res2 = tester.write_to_files(ts, out_dir)
    print(f"ACTUAL file bpsp (bit-exact round-trips): "
          f"{res2.mean_bpsp():.4f}")

    # 3. PNG comparison
    png_bpsps = []
    for p in ts:
        img = load_image_uint8(p)
        png_bpsps.append(os.path.getsize(p) * 8 / img.size)
    print(f"PNG bpsp on the same images: {np.mean(png_bpsps):.4f}")

    # 4. trained-model codec timing (batch 8, same-shape val images)
    imgs = [load_image_uint8(p)[None] for p in ts]
    bc = make_bitcoding(tester.cfg, tester.net, tester.params)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ps = [os.path.join(d, f"w{i}.l3c") for i in range(len(imgs))]
        bc.encode_batch(imgs, ps)   # warm
        outs = bc.decode_batch(ps)
        for im, o in zip(imgs, outs):
            assert np.array_equal(o, im)
        encs, decs = [], []
        for r in range(3):
            ps = [os.path.join(d, f"r{r}_{i}.l3c")
                  for i in range(len(imgs))]
            t0 = time.perf_counter(); bc.encode_batch(imgs, ps)
            encs.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); outs = bc.decode_batch(ps)
            decs.append(time.perf_counter() - t0)
        mp = sum(im.size / 3 for im in imgs) / 1e6
        print(f"trained-model codec: enc {min(encs)*1000:.0f}ms "
              f"dec {min(decs)*1000:.0f}ms per batch of {len(imgs)} "
              f"({2*mp/(min(encs)+min(decs)):.2f} MP/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
