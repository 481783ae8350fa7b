# Retry probes that died on a transient relay error (FailedPrecondition on
# first device transfer — stage 37, 23:45 UTC). Same invocation as stage 37
# via the shared lib; --idempotent skips any probe whose metrics already
# landed in docs/runs/ and appends to the probe log instead of truncating.
source scripts/kl_ppo_probe_lib.sh
kl_ppo_probe kl_ppo_r5recipe --idempotent
kl_ppo_probe kl_ppo_schulman --idempotent algorithm.objective.kl_beta_interval=iteration
