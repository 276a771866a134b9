"""spark-submit launcher: a plain top-level script (spark-submit takes a
file, not a module), delegating to kgspark.run with the package shipped
via --py-files:

    ./tools/make_pyfiles.sh                       # -> dist/kgspark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/kgspark.zip \
        tools/submit_kg.py --input iceberg:warehouse.pages --out s3://.../kg

No --master is set driver-side; spark-submit stays in charge.
"""

from kgspark.run import main

if __name__ == "__main__":
    main()
