from .files import list_files_matching_pattern, scan_dir_regex
from .http_versioned import DownloadOutcome, find_obo_version, update_downloads
from .owl import scan_ontology_meta, scan_rdf_triples, scan_xml_elements
