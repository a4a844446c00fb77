"""Sources and sinks: table readers, transcript derivations, manifest sink."""
