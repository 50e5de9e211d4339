"""Scene graph, loaders, compiler."""
