# rope_closing flagship refresh on shipped code (RESULTS.md placeholder)
r8_train_eval rope_closing rope_closing_hepi_trpl 2400 0.1
