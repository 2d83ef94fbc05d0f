"""Index build: posting-list codec, build job, segment merge."""
