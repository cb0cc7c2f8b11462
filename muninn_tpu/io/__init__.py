"""Persistence: checkpoint/resume (the shadow-table role) + delta logs."""
