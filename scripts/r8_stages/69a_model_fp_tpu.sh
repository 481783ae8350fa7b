# TPU policy-forward fingerprint, both binaries (cloth adjudication): on CPU
# init params + HEPi forward are bit-identical across d2c44f2/HEAD; this
# checks whether the flattened message layout (75f9112) rounds differently
# on the MXU — the candidate mechanism for the flagship's iteration-0
# reward difference on chip.
cp scripts/fp_model.py /tmp/wt_r2/scripts/fp_model.py 2>/dev/null
echo "[r8:model_fp_tpu] HEAD start $(date)" >> "$LOG"
(timeout 900 python scripts/fp_model.py --platform default --envs 8 \
  > docs/fp_model_tpu_head.log 2>&1)
echo "[r8:model_fp_tpu] HEAD rc=$? $(date)" >> "$LOG"
(cd /tmp/wt_r2 && timeout 900 python scripts/fp_model.py --platform default --envs 8 \
  > /root/repo/docs/fp_model_tpu_r2.log 2>&1)
echo "[r8:model_fp_tpu] r2 rc=$? $(date)" >> "$LOG"
