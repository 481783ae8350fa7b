# TPU-path cloth fingerprint, both binaries (round-5 cloth adjudication):
# the CPU fingerprints are bit-identical between d2c44f2 (r2 flagship) and
# HEAD, but on TPU cloth_hanging runs the TILED PALLAS solver, which was
# edited since r2 (self-collision operands etc.). This runs the same fixed-
# action rollout on the real chip under both worktrees; differing numbers
# pinpoint the kernel edits as the same-seed divergence mechanism.
cp scripts/fp_env.py /tmp/wt_r2/scripts/fp_env.py 2>/dev/null
echo "[r8:cloth_fp_tpu] HEAD start $(date)" >> "$LOG"
(timeout 900 python scripts/fp_env.py --platform default --steps 100 --envs 8 \
  > docs/fp_tpu_head.log 2>&1)
echo "[r8:cloth_fp_tpu] HEAD rc=$? $(date)" >> "$LOG"
echo "[r8:cloth_fp_tpu] r2 start $(date)" >> "$LOG"
(cd /tmp/wt_r2 && timeout 900 python scripts/fp_env.py --platform default --steps 100 --envs 8 \
  > /root/repo/docs/fp_tpu_r2.log 2>&1)
echo "[r8:cloth_fp_tpu] r2 rc=$? $(date)" >> "$LOG"
