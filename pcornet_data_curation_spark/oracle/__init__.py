"""Pure-pandas reference implementation (differential oracle for tests)."""
