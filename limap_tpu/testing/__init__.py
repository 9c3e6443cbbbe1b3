"""Testing utilities: reference-semantics oracle + synthetic scenes."""
