"""Neural network stack: input encoder + masked policy/value ResNet."""
