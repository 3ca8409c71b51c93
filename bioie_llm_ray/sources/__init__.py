"""Sources: Ray Data readers for every input format the reference consumes."""
