# kl_ppo root-cause probes (VERDICT item 2, docs/KL_PPO_NOTES.md).
# Stage 35 measured the torchrl-default (no grad clip) failure mode: a
# relaxation oscillator — beta ramps 0.01 -> 1e5 within one iteration, the
# penalty-gradient spike (grad norm up to 6.5e4) poisons Adam's second
# moment, and the policy freezes (ESS=1.0000, KL=0) for ~40 iterations
# while v decays. These two 70-iter probes (7.168M frames each, no eval —
# the diagnostic is the trajectory) complete the story:
#   (a) the EXACT r5 recipe (clip_grad_norm + minimal_std=0.05) that
#       plateaued at -98 with KL in-band — now with beta/grad/KL-part
#       instrumentation, adjudicating where the in-band KL budget goes;
#   (b) same recipe but kl_beta_interval=iteration (Schulman 2017: one beta
#       adapt per update phase instead of per minibatch) — the candidate
#       mechanism fix. Success = (b) tracks clip-PPO through the -104
#       shelf where (a) stalls.
# Probe body shared with the retry stage (scripts/kl_ppo_probe_lib.sh).
source scripts/kl_ppo_probe_lib.sh
kl_ppo_probe kl_ppo_r5recipe
kl_ppo_probe kl_ppo_schulman algorithm.objective.kl_beta_interval=iteration
