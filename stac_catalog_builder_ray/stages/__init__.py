"""Ray Data stages: callable classes for ``map_batches`` actor pools and
vectorized batch functions (SURVEY.md §2.1-2.6)."""
