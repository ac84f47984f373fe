#!/bin/bash
# Container entrypoint (counterpart of reference docker/entrypoint.sh).
set -e
exec "$@"
