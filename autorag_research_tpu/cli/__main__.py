from autorag_research_tpu.cli.app import main

raise SystemExit(main())
