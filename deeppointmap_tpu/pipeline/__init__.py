"""Entry points: infer / train / infer_multiagents (CLI parity with the
reference pipeline/ directory)."""
