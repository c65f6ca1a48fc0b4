#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f word2doc_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('word2doc_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('word2doc_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote word2doc_spark.zip')
"
