"""Operator library: reusable DataFrame→DataFrame transforms.

Each operator is a declarative plan fragment (Catalyst-optimizable), not an
imperative loop — the engine's analog of the reference's hand-coded dataflow
stages (``/root/reference/main.go:50-123``).
"""
