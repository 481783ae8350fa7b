# sliding flagship refresh on shipped code (RESULTS.md placeholder)
r8_train_eval sliding_hepi rigid_sliding_multi_hepi_trpl 5400 0.1
