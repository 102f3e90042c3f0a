"""Tools: model surgery, publishing, dataset tooling."""
