# pushing flagship refresh on shipped code (RESULTS.md placeholder)
r8_train_eval pushing_hepi rigid_pushing_multi_hepi_trpl 7200 0.1
