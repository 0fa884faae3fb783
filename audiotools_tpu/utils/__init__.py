"""Host-side utility subsystems: config, messenger, files, progress."""
