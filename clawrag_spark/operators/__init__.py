"""Relational operators re-expressing ClawRag's query-side semantics."""
