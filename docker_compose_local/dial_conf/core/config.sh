#!/bin/sh
# Render /opt/config/config.json from the template by substituting
# ${VAR} placeholders from the environment (the core image has no
# envsubst; python3 is absent too, so plain sed it is).
set -e

INPUT=/opt/config/config-template.json
OUTPUT=/opt/config/config.json

if [ "${DEPLOY_DIAL_RAG}" = "1" ]; then
  DIAL_RAG_URL="http://dial-rag:5000"
fi
: "${DIAL_RAG_URL:=http://host.docker.internal:5000}"
: "${REMOTE_DIAL_URL:=http://remote-dial-not-configured}"
: "${REMOTE_DIAL_API_KEY:=unset}"

sed \
  -e "s|\${DIAL_RAG_URL}|${DIAL_RAG_URL}|g" \
  -e "s|\${REMOTE_DIAL_URL}|${REMOTE_DIAL_URL}|g" \
  -e "s|\${REMOTE_DIAL_API_KEY}|${REMOTE_DIAL_API_KEY}|g" \
  "$INPUT" > "$OUTPUT"

echo "rendered $OUTPUT (dial-rag at ${DIAL_RAG_URL})"
