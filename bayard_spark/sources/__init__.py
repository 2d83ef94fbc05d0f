"""Sources: deterministic webtext synthesis + index storage layout."""
