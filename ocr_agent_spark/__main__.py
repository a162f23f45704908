from ocr_agent_spark.cli import main

raise SystemExit(main())
