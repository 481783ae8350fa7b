# bf16-precision comparison across binaries on TPU (cloth adjudication):
# for each binary, fingerprint the HEPi policy forward in config-bf16 AND
# float32 on the chip. The f32 runs are the precision reference; if HEAD's
# bf16 forward sits measurably farther from f32 than r2's does, the
# flattened message layout (75f9112) systematically degraded effective
# precision on the MXU — a named, fixable defect. If both errors are the
# same size, the layout change is neutral-precision rounding noise.
cp scripts/fp_model.py /tmp/wt_r2/scripts/fp_model.py 2>/dev/null
for dt in config float32; do
  (timeout 900 python scripts/fp_model.py --platform default --envs 8 --dtype $dt \
    > docs/fp_model_tpu_head_$dt.log 2>&1)
  echo "[r8:model_fp_dtype] HEAD $dt rc=$? $(date)" >> "$LOG"
  (cd /tmp/wt_r2 && timeout 900 python scripts/fp_model.py --platform default --envs 8 --dtype $dt \
    > /root/repo/docs/fp_model_tpu_r2_$dt.log 2>&1)
  echo "[r8:model_fp_dtype] r2 $dt rc=$? $(date)" >> "$LOG"
done
