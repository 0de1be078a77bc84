from llm_rankers_spark.cli import main

raise SystemExit(main())
