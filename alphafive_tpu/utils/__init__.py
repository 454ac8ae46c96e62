"""Shared utilities: dihedral symmetry, Elo, structured logging."""
