"""Learner: pjit data-parallel trainer with the reference's full 11-term
loss, SGD+Nesterov, warmup/schedule, SWA, growing replay window, and
policy-surprise sampling (/root/reference/train/torch/)."""
