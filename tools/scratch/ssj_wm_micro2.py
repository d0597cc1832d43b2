import glob, json, shutil, tempfile, sys
src = open("/root/repo/tools/scratch/ssj_wm_micro.py").read()
head = src.split("T0 = ")[0]
exec(head)
T0 = 1_700_000_000_000 * MS
# clicks:   chunk1 max 100h, chunk2 max 50h
# purchases: chunk1 max 30h, chunk2 max 300h
# per-op memory  -> global2 = min(100h, 300h) - 2h = 98h
# per-batch only -> global1 = min(98h, 28h) = 28h; batch2 candidates
#                   min(48h, 298h) = 48h -> global2 = 48h
w([(1, T0, 10), (1, T0 + 100 * HOUR, 11)], cdir, "overwrite")
w([(1, T0 + 1 * MS, 20), (1, T0 + 30 * HOUR, 21)], pdir, "overwrite")
run()
w([(1, T0 + 50 * HOUR, 12)], cdir, "append")
w([(1, T0 + 300 * HOUR, 22)], pdir, "append")
run()
base_ms = T0 // MS
for f in sorted(glob.glob(f"{ckpt}/offsets/*")):
    d = json.loads(open(f).read().splitlines()[1])
    print("offsets", f.split('/')[-1], "wm-T0_h:",
          (d["batchWatermarkMs"] - base_ms) / 3600e3 if d["batchWatermarkMs"] else 0)
shutil.rmtree(root, ignore_errors=True)
