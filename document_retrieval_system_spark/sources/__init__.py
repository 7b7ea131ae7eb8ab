"""Sources: HTML extraction, synthetic corpus generation, table IO."""
