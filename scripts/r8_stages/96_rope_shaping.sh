# rope_shaping flagship refresh on shipped code (round-5: the RESULTS.md row
# cites the r2-era binary; every headline should be reproduced at HEAD or
# era-labeled). 10M frames; descriptor-RMS eval comes from metrics + play.
r8_train_eval rope_shaping rope_shaping_hepi_trpl 6000 0.1
