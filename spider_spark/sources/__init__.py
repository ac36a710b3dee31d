"""Sources: table loaders, the fetch stage (synthetic + HTTP-stub)."""
