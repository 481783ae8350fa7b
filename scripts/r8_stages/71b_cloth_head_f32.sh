# HEAD cloth flagship with dtype=float32, seed 0 (regression bisect, class
# probe): the r2 binary reproducibly lands ~89% while 5 HEAD bf16 seeds span
# 48-72%. In f32 the flattened layout is BIT-identical to r2 (stage 69b), so
# ~85-90% here => the regression is bf16-specific (flattened layout degrades
# bf16 training); ~55% => semantic change elsewhere.
r8_train_eval cloth_head_f32 cloth_hanging_multi_hepi_trpl 2400 0.2 \
  algorithm.dtype=float32
